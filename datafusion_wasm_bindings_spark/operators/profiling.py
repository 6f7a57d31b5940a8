"""Data-profiling operators: per-column statistics in one scan — the
`df.summary()` analogue a pipeline runs before deciding filters,
partitioning, and skew handling, with exact cross-engine semantics
(Spark's own summary() mixes approximate quantiles in; this stays
oracle-checkable).

Shape: ONE pass computes every metric for every profiled column as a
single wide aggregate row (count/nulls/distinct/min/max/decimal-exact
mean), then a literal-sized unpivot turns it into (column, metric...)
rows. No per-column scans, no shuffle beyond the one global aggregate
(partial map-side, final single row). At 100 TB this is the cheapest
full-profile shape: the scan dominates and is paid once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.queries._util import DEC


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    *,
    exact_distinct: bool = True,
    approx_check: bool = False,
) -> DataFrame:
    """Profile ``numeric_cols``: rows of (column, n, n_null, n_distinct,
    min_v, max_v, mean_v).

    ``exact_distinct=True`` (the oracle-checked default) uses
    count(DISTINCT) per column: storage is still read once, but Spark's
    RewriteDistinctAggregates plans an Expand that replicates the row
    stream (N distinct aggs + 1)× before aggregating — exact, and fine
    up to mid-size inputs. At 100 TB set ``exact_distinct=False``:
    approx_count_distinct (HLL, 2% rsd) needs no Expand, keeping the
    profile a true single-pass map-side aggregate; at that scale the
    distinct count is capacity-planning input, not an exact contract.

    ``approx_check=True`` computes BOTH distinct aggregates in the same
    single scan and appends a ``hll_within_10pct`` boolean per column —
    the self-verifying mode q_profile_columns_approx registers (the HLL
    estimate checked against the exact count without a second pass).
    """
    n_exact = F.countDistinct
    n_hll = lambda col: F.approx_count_distinct(col, 0.02)  # noqa: E731
    n_distinct = n_exact if exact_distinct or approx_check else n_hll
    aggs = []
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            n_distinct(col).alias(f"{c}__n_distinct"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            (
                F.sum(col.cast("double").cast(DEC)).cast("double")
                / F.count(col)
            ).alias(f"{c}__mean"),
        ]
        if approx_check:
            aggs.append(n_hll(col).alias(f"{c}__nd_hll"))
    wide = df.agg(*aggs)
    check = (
        ", abs({c}__nd_hll - {c}__n_distinct) <= 0.1 * {c}__n_distinct"
        if approx_check
        else ""
    )
    stacked = ", ".join(
        (
            f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct" + check.format(c=c)
            + f", {c}__min, {c}__max, round({c}__mean, 6)"
        )
        for c in numeric_cols
    )
    out_cols = "(column_name, n, n_null, n_distinct" + (
        ", hll_within_10pct" if approx_check else ""
    ) + ", min_v, max_v, mean_v)"
    return wide.selectExpr(
        f"stack({len(numeric_cols)}, {stacked}) AS {out_cols}"
    )
