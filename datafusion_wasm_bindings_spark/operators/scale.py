"""Scale machinery: skew-salted joins and bucketed co-located joins.

The task's 100 TB posture names three levers for the shuffles that
built-in planning can't fix alone (SURVEY.md §7.6 "Scale posture"):
AQE (enabled at session build — session.py), key salting for skew, and
bucketing for co-located joins. AQE's skew-join split only kicks in
when runtime partition stats cross thresholds; salting is the
plan-level guarantee, and bucketing removes the shuffle entirely for
repeated joins on the same key. Both are implemented here as reusable
DataFrame transforms, semantics-checked against a plain join oracle
(queries/extensions.py:q_join_salted) and plan-shape-checked in
tests/test_plans.py.

Salting (equi inner/left join, skewed LEFT side):
  left gets a uniform random salt in [0, factor); right is replicated
  ``factor`` times via a literal salt array + explode. Joining on
  (key, salt) splits each hot key's rows across ``factor`` reducer
  partitions. Cost: right side inflates ×factor — use for
  fact ⋈ medium-dim where the dim is too big to broadcast but ×factor
  copies still shuffle cheaply.

Bucketing:
  both sides written once with ``bucketBy(n, key)`` + sortBy; every
  later equi-join on that key sort-merge-joins with NO exchange on
  either side (plan shows zero ``Exchange hashpartitioning``). The
  write cost amortizes across repeated joins — the standard layout for
  a 100 TB fact table joined nightly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on column ``on``, salting the
    (assumed skewed) left side across ``factor`` sub-keys.

    Result is column-identical to ``left.join(right, on, how)`` for
    ``inner``/``left`` joins: output = left columns then right columns
    minus the join key, matching Spark's USING-join column order.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = (F.rand(seed=42) * factor).cast("int")
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    joined = lhs.join(rhs, [on, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    *,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (overwrite).

    Bucket count should divide evenly into target parallelism; at
    100 TB you'd size buckets so each is a few hundred MB.
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written by ``write_bucketed`` on the
    same key/bucket-count: Spark plans a sort-merge join with no
    exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
