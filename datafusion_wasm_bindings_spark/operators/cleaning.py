"""Data-cleaning operators for training pipelines: statistical outlier
flagging over metric columns (the numeric sibling of the text quality
filters in operators/text.py).

Cross-engine determinism: population moments over doubles are
order-dependent under distributed aggregation, so the moments are
accumulated on DECIMAL-quantized values (exact, order-independent —
the queries/_util.py recipe), cast back to double once, and the
z-score arithmetic runs on those identical doubles in a fixed
expression tree. The DuckDB oracle reproduces every bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.queries._util import DEC


def zscore_outliers(
    df: DataFrame,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    *,
    threshold: float = 3.0,
) -> DataFrame:
    """Flag rows whose ``value_col`` sits more than ``threshold``
    sample standard deviations from its group mean.

    Shape: one hash-partitioned window on the group key computes
    (n, Σv, Σv²) exactly on decimal-quantized values; mean/variance/z
    derive per row from those totals. No self-join, no second shuffle.
    At 100 TB the window partitions by a low-cardinality group key —
    for skewed groups swap the window for a groupBy + broadcast join of
    the per-group moments (same math, same oracle).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast(DEC)
    w = Window.partitionBy(group_col)
    n = F.count("*").over(w)
    s = F.sum(v).over(w).cast("double")
    ss = F.sum(v * v).over(w).cast("double")
    vd = v.cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1))
    z = (vd - mean) / F.sqrt(var)
    return df.select(
        *key_cols,
        group_col,
        F.round(z, 6).alias("z"),
        (F.abs(z) > threshold).alias("is_outlier"),
    )
