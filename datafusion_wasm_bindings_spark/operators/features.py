"""Feature-engineering operators: quantile binning (bucketizer).

Equal-frequency binning of a numeric column — the discretization step
feature pipelines run before histogram models, stratified splits, or
length-bucketed batch packing.

Two boundary modes:
- ``exact=True`` (oracle-checked): boundaries from Spark's exact
  interpolating ``percentile`` — bit-identical to DuckDB's
  ``quantile_cont`` (same (n−1)·p rank interpolation on the same
  doubles; verified by the q_feature_binning value check). Exact
  percentile buffers the column per group, so this mode is for
  dimension-to-mid-size relations.
- ``exact=False`` (the 100 TB path): ``approx_percentile`` — a
  mergeable GK sketch, map-side combinable, no per-reducer buffering;
  bin edges differ from exact by the sketch's rank-error bound, which
  is what a 1000-executor pipeline actually ships.

Assignment is a broadcast of the single boundary row + a
``size(filter(...))`` expression — the corpus never shuffles to be
binned; the only wide operation is the boundary aggregate itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    *,
    exact: bool = True,
) -> DataFrame:
    """Add a ``bin`` column: the count of interior quantile boundaries
    ≤ the value, i.e. 0..n_bins−1 equal-frequency buckets of ``col``.
    NULL values get NULL bins."""
    ps = [i / n_bins for i in range(1, n_bins)]
    fn = "percentile" if exact else "percentile_approx"
    bounds = df.agg(
        F.expr(f"{fn}({col}, array({', '.join(str(p) for p in ps)}))").alias(
            "__bnds"
        )
    )
    # 1-row boundary frame: Spark broadcasts it; the filter lambda
    # counts boundaries at or below the value (width_bucket is
    # equal-WIDTH only, so it cannot express quantile buckets)
    return df.join(F.broadcast(bounds)).select(
        *df.columns,
        F.when(
            F.col(col).isNotNull(),
            F.size(F.filter("__bnds", lambda b: b <= F.col(col))),
        ).alias("bin"),
    )
