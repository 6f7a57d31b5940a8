"""Column-level diff of one query between Spark and DuckDB on an
arbitrary fixture dir (default: the adversarial extremes mutation) —
the triage loop companion to tools_adversarial_replay.py.

Usage::

    python tools_triage.py q_fn_math_basic [mutation_dir]

With no dir argument, the default is the CURRENT extremes mutation dir
(mode dirs are keyed by config fingerprint since r9 —
tools_adversarial_replay.build_mode_dir resolves and builds it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import duckdb
    import pandas as pd

    from datafusion_wasm_bindings_spark.queries import load_all, resolve_oracle
    from datafusion_wasm_bindings_spark.queries.sources_q import _ensure_text_fixtures
    from datafusion_wasm_bindings_spark.session import get_spark
    from datafusion_wasm_bindings_spark.sources.catalog import TABLE_NAMES
    from tools_adversarial_replay import _tokens, build_mode_dir

    qid = sys.argv[1]
    # default: the CURRENT fingerprint-keyed extremes dir (the bare
    # mode-only path stopped existing when r9 keyed dirs by config)
    d = sys.argv[2] if len(sys.argv) > 2 else build_mode_dir("extremes")
    _ensure_text_fixtures(d)
    spark = get_spark("dfwb-triage")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spec = load_all()[qid]
    sp = spec.spark_fn(spark, d).toPandas()
    du = con.sql(resolve_oracle(spec.oracle, d)).df()
    cols = sorted(sp.columns, key=str.lower)
    sp, du = sp[cols], du[sorted(du.columns, key=str.lower)]
    print(f"rows: spark={len(sp)} duck={len(du)}")
    st, dt = _tokens(sp), _tokens(du)
    key = st.apply(tuple, axis=1)
    sp_s = sp.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    st_s = st.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    key = dt.apply(tuple, axis=1)
    du_s = du.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    dt_s = dt.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)
    if len(sp) != len(du):
        so = set(map(tuple, st.values))
        do = set(map(tuple, dt.values))
        print("spark-only rows (≤5):")
        for r in list(so - do)[:5]:
            print("  ", r)
        print("duck-only rows (≤5):")
        for r in list(do - so)[:5]:
            print("  ", r)
        return
    n_bad = 0
    for c in cols:
        neq = (st_s[c] != dt_s[c.lower()] if c.lower() in dt_s else st_s[c] != dt_s[c])
        if neq.any():
            idx = neq[neq].index[:6]
            print(f"col {c}: {int(neq.sum())} diffs")
            for i in idx:
                print(f"   row {i}: spark={sp_s[c][i]!r} duck={du_s.iloc[:, list(cols).index(c)][i]!r}")
            n_bad += 1
    if not n_bad:
        print("token-identical after sort")


if __name__ == "__main__":
    main()
