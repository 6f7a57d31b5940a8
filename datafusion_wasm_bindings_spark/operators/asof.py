"""Point-in-time (as-of) join — the feature-lookup operator a
training-data pipeline uses to attach "the most recent X before this
example" without leaking future information.

Neither Spark nor the reference engine (DataFusion 45 — no ASOF in
datafusion-sql, Cargo.lock:1010) has a native ASOF join; DuckDB does,
which is what the q_join_asof oracle runs. The Spark implementation is
the classic union-merge rewrite, NOT a range self-join:

1. tag and union the two inputs on aligned schemas (right rows carry
   their payload, left rows carry nulls for it);
2. one window per key, ordered by (ts, tag) with right-before-left at
   ties so an equal-timestamp right row matches (ASOF's ``<=``);
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT propagates the latest right payload forward;
4. keep the left-tagged rows.

Scale shape: ONE shuffle of left+right on the join keys, then a linear
within-partition sort-and-sweep — no join blowup, no per-left-row range
probe. At 100 TB with a hot key, pre-bucket the time axis into the key
(salt by coarse time bucket, run per bucket, seed each bucket with the
previous bucket's last right row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    right_prefix: str = "ref_",
) -> DataFrame:
    """LEFT as-of join: for each left row, the right row with the
    largest ``ts`` satisfying ``right.ts <= left.ts`` within the same
    ``on`` keys; right payload columns are surfaced with
    ``right_prefix`` (including the matched timestamp). Right rows must
    be unique per (on, ts) — pre-aggregate if not — or the tie-winner
    is unspecified.
    """
    keys = list(on)
    lcols = [c for c in left.columns if c not in keys and c != ts]
    rcols = [c for c in right.columns if c not in keys and c != ts]
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    # NULL join keys never match under join equality (the semantics
    # DuckDB's ASOF ... ON l.k = r.k has): drop NULL-keyed right rows
    # so a NULL-keyed left row — which Window.partitionBy would
    # otherwise group with them — comes back with NULL refs instead.
    right_nn = right
    for k in keys:
        right_nn = right_nn.filter(F.col(k).isNotNull())
    # A NULL-ts right row can never satisfy right.ts <= left.ts (the
    # inequality is NULL), but under Spark's ASC NULLS FIRST it would
    # sort to the partition head and forward-fill its payload into
    # every left row — drop it (adversarial NULL replay, r5). NULL-ts
    # LEFT rows also sort first, see no prior right row, and surface
    # NULL refs — exactly DuckDB ASOF's no-match result for them.
    right_nn = right_nn.filter(F.col(ts).isNotNull())

    # the right payload travels as ONE struct so the forward fill is
    # atomic per right row: per-column last(ignorenulls) would let a
    # NULL payload value resurrect the previous row's value, stitching
    # together a right row that never existed.
    payload = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    l2 = left.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(
            right_nn.select(payload.alias("__p")).schema["__p"].dataType
        ).alias("__p"),
    )
    r2 = right_nn.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        payload.alias("__p"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc_nulls_first(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        *keys,
        "__ts",
        "__tag",
        *lcols,
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__tag") == 1).select(
        *keys,
        F.col("__ts").alias(ts),
        *lcols,
        *[F.col(f"__p.{c}").alias(right_prefix + c) for c in rcols],
        F.col("__p.__rts").alias(right_prefix + ts),
    )
