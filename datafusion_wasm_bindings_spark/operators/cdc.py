"""Change-data-capture compaction: apply a changelog to a base snapshot.

A 100 TB corpus is never rebuilt from scratch — it is maintained by
applying incremental upsert/delete feeds (CDC from an OLTP source, or
re-crawled/re-scored documents in a training-data pipeline) to the
previous snapshot. The standard compaction (what Hudi/Iceberg call
merge-on-read) is latest-version-wins per key with delete tombstones:

  snapshot' = rows of (base ∪ changes) with the highest version per
              key, minus rows whose winning change is a delete.

Spark-first plan: ONE shuffle — union is free (no exchange), and the
per-key latest-row selection is a single ``row_number`` window over
``hashpartitioning(keys)``. At 100 TB the win is that the shuffle
carries base+delta once, with no join: the naive
``base LEFT ANTI JOIN deletes`` + ``base LEFT JOIN updates`` shape
shuffles the base twice. If the base is bucketed by key (see
operators/scale.write_bucketed) even that single exchange disappears
for the base side.

The reference (a DataFusion 45 WASM binding, src/core.rs:34-99)
exposes only INSERT INTO on MemTables — no MERGE; this extension adds
the pipeline capability Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins snapshot compaction.

    ``base``: the current snapshot (payload columns only — no
    ``version_col``/``op_col``); treated as version 0 inserts.
    ``changes``: same payload columns plus ``version_col`` (BIGINT,
    strictly positive, unique per key — the CDC log sequence number)
    and ``op_col`` ('U' upsert / 'D' delete).

    Returns the new snapshot with base's columns. Deterministic
    whenever versions are unique per key (the CDC contract); ties are
    broken by op descending ('U' > 'I' > 'D' is NOT assumed — supply
    unique versions).
    """
    payload = [c for c in base.columns]
    tagged = base.select(
        *payload,
        F.lit(0).cast("long").alias(version_col),
        F.lit("I").alias(op_col),
    )
    merged = tagged.unionByName(changes.select(*payload, version_col, op_col))
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .select(*payload)
    )


def scd2_intervals(
    changes: DataFrame,
    *,
    key_cols: list[str],
    attr_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an attribute
    change stream: collapse consecutive runs of the same attribute
    value (per key, in ``order_cols`` order) and emit one validity
    interval per run.

    Output adds ``valid_from`` (the first order column's value at the
    run start), ``valid_to`` (next run's start, NULL while current)
    and ``is_current``. Two windows over the SAME (key, order)
    partitioning — Spark plans a single sort+exchange and runs both
    window functions in one pass. At scale the shuffle carries only
    (key, attr, order) — project payload columns back in afterwards.
    """
    from pyspark.sql import Window

    part = Window.partitionBy(*key_cols).orderBy(*order_cols)
    first_order = F.col(order_cols[0])
    # run boundary = partition head OR a NULL-SAFE attribute change:
    # "lag IS NULL" conflated the head with a genuine NULL attribute in
    # the previous row, and lag != attr is 3-valued when either side is
    # NULL — a run of NULL attribute would silently never open
    # (adversarial NULL replay, r5)
    prev = F.lag(F.col(attr_col)).over(part)
    changed = (F.row_number().over(part) == 1) | ~prev.eqNullSafe(F.col(attr_col))
    runs = changes.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    nxt = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        runs.withColumn("valid_from", first_order)
        .withColumn("valid_to", F.lead("valid_from").over(nxt))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Dataset-version diff: one row of added/removed/changed/unchanged
    counts between two snapshots, comparing an md5 content signature of
    the payload per key. The counting full-outer join is the ONLY
    shuffle, keyed on the join key; at 100 TB run it per shard (see
    packing.dataset_manifest) and only diff shards whose manifest
    checksums moved — this operator is the shard-level drilldown.
    """
    # each payload column coalesces to a '<NULL>' sentinel BEFORE the
    # signature: concat_ws would silently SKIP a NULL column, making
    # (NULL,'x') and ('x',NULL) collide — and a raw || chain would
    # NULL the whole signature, miscounting matched keys as
    # added+removed (adversarial NULL replay, r5)
    def sig(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            *[F.col(c) for c in key_cols],
            F.md5(
                F.concat_ws(
                    ":",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                        for c in payload_cols
                    ],
                )
            ).alias(name),
        )

    joined = sig(old, "sig_old").join(sig(new, "sig_new"), key_cols, "full_outer")
    return joined.agg(
        F.sum(F.when(F.col("sig_old").isNull(), 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(F.col("sig_new").isNull(), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.sum(
            F.when(
                F.col("sig_old").isNotNull()
                & F.col("sig_new").isNotNull()
                & (F.col("sig_old") != F.col("sig_new")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_changed"),
        F.sum(
            F.when(F.col("sig_old") == F.col("sig_new"), 1).otherwise(0)
        ).cast("long").alias("n_unchanged"),
    )
