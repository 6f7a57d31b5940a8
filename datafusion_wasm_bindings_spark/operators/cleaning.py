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

    Shape: one map-side-combinable aggregate reduces the fact to the
    |groups|-row moment table (n, Σv, Σv²) on decimal-quantized values;
    the tiny table broadcasts back, and mean/variance/z derive per row
    map-side. The fact itself is never shuffled — strictly better than
    the per-group window formulation this replaced (r4), which hashed
    the whole fact onto ~|groups| tasks (one sequential task per group
    value at 100 TB for a low-cardinality group key).

    The join back is NULL-SAFE on ``group_col``: groupBy keeps NULL as
    its own group exactly like the window's PARTITION BY did, and a
    plain equi-join would silently drop those rows (ADVICE r4).

    ``is_outlier`` is TOTAL: a row whose value is NULL has NULL z and
    is flagged FALSE, never NULL — a nullable boolean surface is both
    semantically mushy ("unknown outlier") and a cross-engine hashing
    trap (pandas materializes Spark's NULL bool as None and DuckDB's
    as NaN; the adversarial NULL-injection replay caught exactly
    this divergence class).
    """
    v = F.col(value_col).cast(DEC)
    moments = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).cast("double").alias("__s"),
        F.sum(v * v).cast("double").alias("__ss"),
    )
    vd = v.cast("double")
    n, s, ss = F.col("__n"), F.col("__s"), F.col("__ss")
    mean = s / n
    # try_divide + greatest clamp (adversarial extremes replay, r6): a
    # singleton group's n−1 division and a zero-variance group's σ = 0
    # both yield z NULL (→ is_outlier FALSE), never an ANSI abort —
    # DuckDB's native x/0 → NULL matches; the clamp keeps an exact-
    # zero-variance group's −ε double out of sqrt (DuckDB ERRORS)
    var = F.try_divide(ss - s * s / n, n - F.lit(1))
    z = F.try_divide(vd - mean, F.sqrt(F.greatest(var, F.lit(0.0))))
    return df.join(
        F.broadcast(moments), F.col(group_col).eqNullSafe(F.col("__g"))
    ).select(
        *key_cols,
        group_col,
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_outlier"),
    )
