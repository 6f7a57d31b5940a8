"""Approx-sketch accuracy checks.

The approx queries each output the exact value (hash-checked against
the DuckDB oracle) plus boolean columns asserting the sketch landed
within its documented error bound — so the oracle differential already
enforces accuracy. These tests re-assert the booleans directly so a
sketch regression fails with a readable message, not a hash mismatch.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import load_all

REGISTRY = load_all()


def test_approx_count_distinct_within_bound(spark, sf_dir):
    df = REGISTRY["q_fn_approx_distinct"].spark_fn(spark, sf_dir)
    for r in df.collect():
        assert r.hll_within_10pct, f"{r.l_returnflag}: HLL off by >10% (exact {r.exact_parts})"


def test_approx_median_within_bound(spark, sf_dir):
    df = REGISTRY["q_fn_approx_median"].spark_fn(spark, sf_dir)
    for r in df.collect():
        assert r.sketch_within_2pct, f"{r.l_returnflag}: approx median off by >2% (exact {r.exact_med})"


def test_approx_percentile_within_bound(spark, sf_dir):
    df = REGISTRY["q_fn_approx_percentile"].spark_fn(spark, sf_dir)
    for r in df.collect():
        assert r.p10_within_2pct and r.p90_within_2pct, (
            f"{r.l_returnflag}: approx percentile off by >2% "
            f"(exact p10 {r.p10_exact}, p90 {r.p90_exact})"
        )
