"""Event-behavior analytics: ordered funnels and cohort retention.

Reference parity: the reference engine (datafusion-wasm-bindings →
DataFusion) expresses these as plain SQL over an events table
(`/root/reference/src/lib.rs` executes arbitrary SQL); here they are
first-class operators because training-data / product pipelines run
them constantly at 100 TB scale.

Scale posture:
- ``funnel``: one shuffle per step, ALL on the same ``user_id`` key —
  Spark reuses the hash partitioning across the chained joins (no
  re-exchange between steps), and each step's input shrinks
  monotonically (only users who survived the previous step).
  The step tables are filtered projections of one scan; Catalyst
  pushes ``event_type = literal`` into the parquet scan of each
  branch.
- ``retention``: two aggregations keyed by ``user_id`` then
  ``(cohort_day, offset)``; the distinct-user count is map-side
  partial-aggregated. No windows, no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: Sequence[str], *, ts_col: str = "ts",
           user_col: str = "user_id", type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel user counts: for each step i, the number of users
    whose first step-i event STRICTLY follows their first qualifying
    step-(i-1) event.

    Returns one row: ``step_1 .. step_N`` (BIGINT user counts).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")

    # first qualifying timestamp per user, step by step
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        branch = events.filter(F.col(type_col) == step)
        if prev is None:
            cur = branch.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        else:
            cur = (
                branch.join(prev, user_col)
                .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(f"t{i}"))
            )
        reached.append(cur)
        prev = cur

    counts = [
        df.agg(F.count(F.lit(1)).alias(f"step_{i + 1}"))
        for i, df in enumerate(reached)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


def retention(events: DataFrame, *, ts_col: str = "ts",
              user_col: str = "user_id") -> DataFrame:
    """Cohort retention triangle: users grouped by their first active
    day (cohort), counted distinctly on each later active day.

    Output: ``cohort_day`` (DATE), ``day_offset`` (BIGINT),
    ``n_users`` (BIGINT).
    """
    day = F.to_date(F.col(ts_col))
    cohort = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(F.col(user_col), day.alias("active_day")).distinct()
    return (
        active.join(cohort, user_col)
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def rolling_window(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-key trailing time-RANGE aggregates at every event: how many
    events / how much value this key produced in the preceding
    ``window_seconds`` (inclusive of the current instant) — the rate /
    velocity feature behind abuse detection and feature stores.

    The frame is a true RANGE frame over epoch MICROS (not a row
    frame), so irregular event spacing is handled exactly. One
    exchange on the key; within-key sort only. The trailing value sum
    goes through DECIMAL(18,6) so the sliding-sum is order-exact
    cross-engine.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    lo = -(window_seconds * 1_000_000 - 1)
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(lo, 0)
    )
    return events.select(
        key_col,
        us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).over(w)
        .cast("double")
        .alias("value_trailing"),
    )


def experiment_metrics(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    metric_event: str = "purchase",
    n_variants: int = 2,
    salt: str = "dfwb-exp",
) -> DataFrame:
    """A/B experiment readout: assign each user to a variant by a
    content-addressed md5 bucket (deterministic, balanced, engine-
    portable), aggregate a per-user metric (summed value of
    ``metric_event`` events, zero for non-converters), and emit
    per-variant count / total / mean / sample variance.

    Cross-engine float determinism: the per-user metric and its square
    are summed through DECIMAL(18,6); mean and variance are then pure
    double arithmetic on identical inputs, so the readout is
    bit-identical in any engine — built-in stddev/var aggregates are
    NOT (their summation order floats with partitioning).

    Two keyed shuffles (user, then variant); both partial-aggregate
    map-side. The per-user metric includes every user seen in the
    events feed (intent-to-treat), not only converters.
    """
    DEC = "decimal(18,6)"
    variant = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(user_col).cast("string"), F.lit(salt))), 1, 4),
            16,
            10,
        ).cast("long")
        % n_variants
    )
    per_user = (
        events.groupBy(user_col)
        .agg(
            F.sum(
                F.when(F.col(type_col) == metric_event, F.col(value_col))
                .otherwise(F.lit(0.0))
                .cast(DEC)
            )
            .cast("double")
            .alias("user_value")
        )
        .withColumn("variant", variant)
    )
    n = F.count(F.lit(1))
    s = F.sum(F.col("user_value").cast(DEC)).cast("double")
    sq = F.sum((F.col("user_value") * F.col("user_value")).cast(DEC)).cast("double")
    return (
        per_user.groupBy("variant")
        .agg(
            n.alias("n_users"),
            F.round(s, 6).alias("total_value"),
            F.round(s / n, 6).alias("mean_value"),
            # sample variance is undefined for a 1-user variant (the
            # NULL-user bucket is exactly that) — NULL, not a /0 throw
            # under ANSI (adversarial NULL replay, r5)
            F.when(n > 1, F.round((sq - s * s / n) / (n - 1), 6)).alias("var_value"),
        )
    )
