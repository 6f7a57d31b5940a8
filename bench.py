"""Benchmark runner — driver contract (BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing excludes session startup (JVM launch is a fixed cost, not query
throughput) and includes full materialization of each result via a
count+collect, mirroring the reference's collect() semantics
(src/core.rs:119).

Optional concurrency experiment: SPARK_GRAFT_BENCH_THREADS=N (N >= 2)
re-runs the headline set from N driver threads at once (each thread
runs every query once) and adds a "concurrency" key to the same single
JSON line — wall-clock, aggregate queries/sec, and scaling efficiency
vs the sequential best-run total. Concurrent submission is how a shared
cluster actually sees this engine (many sessions, one scheduler); the
experiment shows how much of the sequential per-query fixed cost
(job scheduling, codegen reuse) overlaps away. Off by default: the
driver contract output is byte-identical when the env var is unset.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from datafusion_wasm_bindings_spark.session import get_spark
    from datafusion_wasm_bindings_spark.queries import load_all

    spark = get_spark("dfwb-spark-bench")
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline} or registry

    # Size the scan split to THIS input (the 100 TB-posture sizing
    # rule; see session.size_scan_splits for the measured rationale).
    from datafusion_wasm_bindings_spark.session import size_scan_splits

    size_scan_splits(spark, sf_dir)

    # warm the JVM + parquet footers once, outside the timed section
    from datafusion_wasm_bindings_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    # two timed runs per query, report the best: run 1 pays one-time
    # whole-stage-codegen compilation (~0.5-1 s/query on this box, a
    # fixed cost like session startup, not query throughput); run 2 is
    # the steady-state a resident engine delivers. Data caches are NOT
    # involved (no .cache(); OS page cache is warm after the first scan
    # either way).
    timings: dict[str, float] = {}
    for name, spec in sorted(headline.items()):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    n_threads = int(os.environ.get("SPARK_GRAFT_BENCH_THREADS", "0"))
    if n_threads >= 2:
        from concurrent.futures import ThreadPoolExecutor

        def run_set() -> None:
            for _, spec in sorted(headline.items()):
                spec.spark_fn(spark, sf_dir).collect()

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            for fut in [pool.submit(run_set) for _ in range(n_threads)]:
                fut.result()
        wall = time.perf_counter() - t0
        n_queries = n_threads * len(headline)
        payload["concurrency"] = {
            "threads": n_threads,
            "wall_sec": round(wall, 4),
            "queries_per_sec": round(n_queries / wall, 4),
            # speedup over running the N sets back-to-back, divided by
            # N; 1.0 = N sets in the wall-clock of one, >1.0 means
            # concurrency also overlapped away sequential fixed costs
            "scaling_efficiency": round(total / wall, 4),
        }

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
