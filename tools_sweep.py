"""Full-registry timing sweep: run every registered query once at
$SPARK_GRAFT_SF_DIR (default sf0.1), one shared session, sequential —
the SWEEP_r{N}_local.json artifact BASELINE.md cites. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools_sweep.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_r03_local.json"

    from datafusion_wasm_bindings_spark.queries import load_all
    from datafusion_wasm_bindings_spark.session import get_spark, size_scan_splits

    spark = get_spark("dfwb-sweep")
    size_scan_splits(spark, sf_dir)  # input-sized splits, as bench.py
    registry = load_all()
    # untimed warm-up: pay session/codegen/scan-index fixed costs once
    # so position-1 of the sweep doesn't absorb them (the cold-vs-warm
    # split is tracked separately in BASELINE.md datapoints)
    first = next(iter(registry.values()))
    try:
        first.spark_fn(spark, sf_dir).collect()
    except Exception:  # noqa: BLE001 — the timed loop will record it
        pass
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    t_all = time.monotonic()
    for name, spec in registry.items():
        t0 = time.monotonic()
        try:
            df = spec.spark_fn(spark, sf_dir)
            df.collect()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            errs[name] = f"{type(e).__name__}: {e}"[:200]
    payload = {
        "total_sec": round(time.monotonic() - t_all, 1),
        "n_queries": len(times),
        "times": times,
    }
    if errs:
        payload["errors"] = errs
    json.dump(payload, open(out_path, "w"), indent=1)
    print(out_path, payload["total_sec"], "sec,", len(times), "ok,", len(errs), "err")


if __name__ == "__main__":
    main()
