"""Registry thread-safety: the bench harness (SPARK_GRAFT_BENCH_THREADS)
runs the registry from several threads of one process, and the driver
gate may run concurrently from another — every sink/scratch query
scopes its paths and table names by pid+thread id (scratch.scope()).

This test replays that execution mode: the scratch-writing queries run
simultaneously from several threads, and every thread must reproduce
the single-thread baseline exactly (same rows, same values). A scoping
regression shows up as overwrite corruption (wrong counts / read
errors), not flakiness, so exact comparison is the right check.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from datafusion_wasm_bindings_spark.queries import load_all

REGISTRY = load_all()

# scratch-writing queries (parquet/csv/json sinks, CTAS, INSERT,
# partitioned copy, incremental state table) plus one pure query so
# reads interleave with writes
_IDS = (
    "q_copy_parquet",
    "q_copy_csv",
    "q_copy_json",
    "q_values_ctas",
    "q_insert_into",
    "q_scale_incremental_agg",
    "q_join_inner",
)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_sink_queries_thread_safe(spark, sf_dir):
    baseline = {
        n: _canon(REGISTRY[n].spark_fn(spark, sf_dir).collect()) for n in _IDS
    }

    def run_all(_i):
        return {
            n: _canon(REGISTRY[n].spark_fn(spark, sf_dir).collect()) for n in _IDS
        }

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(run_all, range(3)))
    for res in results:
        for n in _IDS:
            assert res[n] == baseline[n], f"{n} diverged under concurrency"
