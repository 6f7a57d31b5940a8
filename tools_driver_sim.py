"""Driver-gate simulation: run the upcoming verification window the way
the ROUND DRIVER does — both sides materialized through PANDAS (Spark
``toPandas()`` vs DuckDB ``.df()``), columns sorted by name, dtype
families compared, values hashed — then report per-id verdicts.

This closes the gap the round-2 failures exposed: the pytest gate
compares Python values (``fetchall``, where 3 == 3.0), while the driver
hashes pandas dtypes (int64 != float64 even on equal values). Run
before each round: ``python tools_driver_sim.py [n_ids]``.

Importable API (used by tests/test_driver_sim_gate.py, the pre-commit
gate for oracle edits): ``compare_frames(spark_pd, duck_pd)`` and
``simulate(ids, spark, con, sf_dir)``.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _canon(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    df = df[sorted(df.columns, key=str.lower)]
    dtypes = {c: str(df[c].dtype) for c in df.columns}
    # row order is insignificant: sort by every column (stringified so
    # mixed/NaN columns sort deterministically)
    key = df.astype(str).apply(tuple, axis=1)
    return df.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True), dtypes


def _family(dtype: str, col: pd.Series) -> str:
    if dtype.startswith(("int", "uint", "Int")):
        return "int"
    if dtype.startswith("float"):
        return "float"
    if dtype.startswith("datetime"):
        # DuckDB materializes DATE as datetime64; Spark DATE arrives as
        # object-of-datetime.date. Driver r1/r2 green rows include DATE
        # columns, so this representation split is proven safe — fold
        # both into one family.
        return "date"
    if dtype == "object":
        import datetime as _dt

        non_null = col.dropna()
        if len(non_null) and all(isinstance(v, _dt.date) for v in non_null.head(20)):
            return "date"
    return dtype  # object, bool, ...


def compare_frames(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> dict:
    """The driver's pandas-level comparison for one query: canonicalize
    both frames, then check row count, column names, dtype families
    (int64 vs float64 is a FAIL even on equal values — the r2 HUGEINT
    bug class), and stringified values."""
    rec: dict = {}
    s_pd, s_dt = _canon(spark_pd)
    d_pd, d_dt = _canon(duck_pd)
    rec["rows_match"] = len(s_pd) == len(d_pd)
    rec["cols_match"] = [c.lower() for c in s_pd.columns] == [
        c.lower() for c in d_pd.columns
    ]
    fam_mismatch = [
        (sc, s_dt[sc], d_dt[dc])
        for sc, dc in zip(s_pd.columns, d_pd.columns)
        if _family(s_dt[sc], s_pd[sc]) != _family(d_dt[dc], d_pd[dc])
    ]
    rec["dtype_family_match"] = not fam_mismatch
    if fam_mismatch:
        rec["dtype_mismatch"] = fam_mismatch
    eq = s_pd.astype(str).reset_index(drop=True).equals(
        d_pd.astype(str).set_axis(list(s_pd.columns), axis=1).reset_index(drop=True)
    ) if rec["rows_match"] and rec["cols_match"] else False
    rec["values_match"] = bool(eq)
    rec["ok"] = all(
        (rec["rows_match"], rec["cols_match"], rec["dtype_family_match"], rec["values_match"])
    )
    return rec


def simulate(todo, spark, con, sf_dir: str) -> dict[str, dict]:
    """Run the driver-level comparison over ``todo`` — an iterable of
    (name, QuerySpec) pairs — against an existing SparkSession and a
    DuckDB connection that already has the fixture views."""
    from datafusion_wasm_bindings_spark.queries import resolve_oracle

    results: dict[str, dict] = {}
    for name, spec in todo:
        try:
            rec = compare_frames(
                spec.spark_fn(spark, sf_dir).toPandas(),
                con.sql(resolve_oracle(spec.oracle, sf_dir)).df(),
            )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            rec = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
        results[name] = rec
    return results


def main() -> None:
    # argv: either a single int (first-N of the window ordering) or an
    # explicit list of query ids
    names: list[str] | None = None
    limit = 50
    if len(sys.argv) > 1:
        try:
            limit = int(sys.argv[1])
        except ValueError:
            names = sys.argv[1:]
    from datafusion_wasm_bindings_spark.queries import load_all
    from datafusion_wasm_bindings_spark.queries.sources_q import _ensure_text_fixtures
    from datafusion_wasm_bindings_spark.session import get_spark
    from datafusion_wasm_bindings_spark.sources.catalog import TABLE_NAMES

    _ensure_text_fixtures(SF_DIR)
    spark = get_spark("dfwb-driver-sim")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    registry = load_all()
    if names is not None:
        missing = [n for n in names if n not in registry]
        if missing:
            sys.exit(f"unknown query ids: {missing}")
        todo = [(n, registry[n]) for n in names]
    else:
        todo = list(registry.items())[:limit]
    results = simulate(todo, spark, con, SF_DIR)

    bad = {k: v for k, v in results.items() if not v["ok"]}
    json.dump(results, open("/tmp/driver_sim.json", "w"), indent=1, default=str)
    print(f"driver-sim: {len(results) - len(bad)}/{len(results)} ok at {SF_DIR}")
    for k, v in bad.items():
        print("FAIL", k, {kk: vv for kk, vv in v.items() if kk != "ok"})
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
