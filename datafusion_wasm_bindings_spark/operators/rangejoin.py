"""Interval (range) join — match point events to time intervals
without a nested-loop plan.

Spark compiles a raw ``ts BETWEEN start AND end`` join predicate (plus
an equi-key) into SortMergeJoin with a residual only when the equi-key
is selective; with hot keys or no key it degrades to
BroadcastNestedLoopJoin — O(|events|·|intervals|) per key. Neither
Spark nor DataFusion 45 has a dedicated range-join operator (Databricks
runtime and DuckDB's IEJoin are the proprietary/native exceptions —
the latter is what the q_join_range oracle exercises).

Bucketed rewrite: choose a bucket width ≥ the maximum interval length,
then
1. each interval covers at most 2 buckets → explode it to those bucket
   ids (``sequence`` — bounded fan-out, exact);
2. each event has exactly ONE bucket id;
3. equi-join on (key, bucket) + residual ``ts BETWEEN start AND end``.
Every true (event, interval) pair shares exactly one bucket row, so no
dedup is needed. The join is a plain hash/sort-merge equi-join: shuffle
keyed on (key, bucket), per-bucket work bounded by bucket population ×
interval fan-in — the shape that survives 100 TB, with the time axis
itself spreading hot keys across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Inner-join point rows to interval rows sharing ``on`` keys with
    ``ts`` ∈ [start, end] (inclusive). Correct for ANY interval length:
    each interval is exploded to every bucket it covers (sequence of
    start→end buckets), so long intervals only grow the explode fan-out
    — size ``bucket_seconds`` near the typical interval length to bound
    that replication (a perf knob, not a correctness requirement)."""
    # floor, not cast-truncate: pre-1970 instants have negative epochs
    w = F.lit(bucket_seconds)
    ev = events.withColumn(
        "__bkt", F.floor(F.unix_seconds(F.col(ts)) / w).cast("long")
    )
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_seconds(F.col(start)) / w).cast("long"),
                F.floor(F.unix_seconds(F.col(end)) / w).cast("long"),
            )
        ),
    )
    cond = [ev[c] == iv[c] for c in on] + [ev["__bkt"] == iv["__bkt"]]
    joined = ev.join(iv, cond).filter(
        (ev[ts] >= iv[start]) & (ev[ts] <= iv[end])
    )
    keep = (
        [ev[c] for c in on]
        + [ev[c] for c in events.columns if c not in on and c != "__bkt"]
        + [iv[c] for c in intervals.columns if c not in on and c != "__bkt"]
    )
    return joined.select(*keep)
