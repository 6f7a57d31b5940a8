"""Bounded-error checks for approx sketches (HLL / quantile digest):
these can't hash-match a DuckDB oracle (different sketch algorithms),
so the correctness claim is relative error against exact values."""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import load_all

REGISTRY = load_all()


def test_approx_count_distinct_error(spark, sf_dir):
    df = REGISTRY["q_fn_approx_distinct"].spark_fn(spark, sf_dir)
    approx = {r.l_returnflag: r.approx_parts for r in df.collect()}
    exact = {
        r.l_returnflag: r.n
        for r in spark.sql(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n FROM lineitem GROUP BY l_returnflag"
        ).collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.1, f"{k}: approx {approx[k]} vs exact {e}"


def test_approx_percentile_brackets_exact(spark, sf_dir):
    df = REGISTRY["q_fn_approx_percentile"].spark_fn(spark, sf_dir)
    rows = {r.l_returnflag: (r.p10, r.p90) for r in df.collect()}
    exact = {
        r.l_returnflag: (r.p10, r.p90)
        for r in spark.sql(
            """SELECT l_returnflag,
                      percentile(l_extendedprice, 0.1) AS p10,
                      percentile(l_extendedprice, 0.9) AS p90
               FROM lineitem GROUP BY l_returnflag"""
        ).collect()
    }
    for k, (p10, p90) in rows.items():
        e10, e90 = exact[k]
        spread = e90 - e10
        assert abs(p10 - e10) < 0.05 * spread + 1
        assert abs(p90 - e90) < 0.05 * spread + 1
