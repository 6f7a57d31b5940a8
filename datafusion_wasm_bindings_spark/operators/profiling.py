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

    ``approx_check=True`` appends a ``hll_within_10pct`` boolean per
    column — the self-verifying mode q_profile_columns_approx
    registers. The HLL sketches are computed in their OWN lean
    aggregate and crossJoined to the exact profile (two jobs over the
    same warm storage), NOT folded into the exact aggregate: the
    distinct rewrite's first stage groups by each column's VALUES, and
    attaching a multi-KB HLL buffer (rsd 0.02 → 4096 registers) to
    every high-cardinality group multiplies state by orders of
    magnitude (measured 12× wall-clock at sf0.1 before the split).
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
    wide = df.agg(*aggs)
    if approx_check:
        hll_wide = df.agg(
            *[n_hll(F.col(c)).alias(f"{c}__nd_hll") for c in numeric_cols]
        )
        wide = wide.crossJoin(F.broadcast(hll_wide))
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


def sharded_hll_distinct(
    df: DataFrame,
    key: str,
    *,
    n_shards: int = 8,
    lgk: int = 12,
    tol: float = 0.05,
) -> DataFrame:
    """Two-level distinct counting with mergeable HLL sketches — THE
    100 TB architecture for distinct stats: each shard (in production,
    each partition/file/day) aggregates its own fixed-size DataSketches
    HLL (``hll_sketch_agg``), and the tiny binary sketches — not the
    rows — are unioned (``hll_union_agg``) for the global estimate.
    Incremental by construction: a new day's shard sketch unions into
    last month's without rescanning history.

    Shards here are assigned by the engine-portable md5 draw (keys are
    hash-partitioned, so every occurrence of a key lands in one shard
    and the per-shard EXACT distinct counts sum to the global exact
    count — computed in the same pass as the sketches). Output is one
    row: (n_shards, n_distinct, hll_within_5pct) where the boolean
    asserts the merged-sketch estimate landed within ``tol`` of exact —
    the q_fn_approx_distinct oracle pattern, so the driver's value
    check verifies the sketch-merge accuracy contract itself."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    per_shard = (
        df.select(F.col(key).alias("k"), F.pmod(h, F.lit(n_shards)).alias("shard"))
        .groupBy("shard")
        .agg(
            F.hll_sketch_agg(F.col("k"), F.lit(lgk)).alias("sk"),
            F.countDistinct("k").alias("shard_exact"),
        )
    )
    merged = per_shard.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("shard_exact").alias("n_distinct"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est"),
    )
    # COALESCEs: an EMPTY input has zero shard groups, so the outer SUM
    # and the union-estimate are NULL — zero keys means n_distinct = 0
    # and the tolerance contract holds vacuously (empty-mode replay r7)
    return merged.select(
        "n_shards",
        F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias("n_distinct"),
        F.coalesce(
            F.abs(F.col("est") - F.col("n_distinct"))
            <= F.lit(tol) * F.col("n_distinct"),
            F.lit(True),
        ).alias("hll_within_5pct"),
    )


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the measurement that
    decides between a plain shuffle, AQE skew splitting, and explicit
    salting (operators/scale.salted_join) before launching a 100 TB
    job. Returns ONE row: total rows, distinct keys, the heaviest
    key's count and identity, exact p50/p99 of the per-key count
    distribution, and skew_ratio = max/p50.

    Exact percentiles WITHOUT a global sort: per-key counts collapse
    to a count-of-counts histogram first (size = number of DISTINCT
    group sizes — tiny even when keys number in the billions), and the
    percentile is read off the histogram's running sum. The only
    global window runs over that tiny histogram — the same two-pass
    trick as the weighted-percentile rewrite (queries/extensions.py
    q_fn_weighted_percentile), so no corpus-sized single-partition
    stage exists. Ranks use exact integer ceil((q·n)) arithmetic so
    any engine replays them bit-identically."""
    from pyspark.sql import Window

    from datafusion_wasm_bindings_spark.operators.scale import _idiv

    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    hist = counts.groupBy("cnt").agg(
        F.count(F.lit(1)).alias("k"), F.min("key").alias("minkey")
    )
    pref = hist.withColumn(
        "cum", F.sum("k").over(Window.orderBy(F.col("cnt").asc()))
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    p50_rank = _idiv(F.col("n_keys") + 1, F.lit(2))
    p99_rank = _idiv(F.lit(99) * F.col("n_keys") + 99, F.lit(100))
    agg = (
        pref.crossJoin(F.broadcast(tot))
        .agg(
            F.min("n_keys").alias("n_keys"),
            F.min("n_rows").alias("n_rows"),
            F.min("max_cnt").alias("max_cnt"),
            F.min(F.when(F.col("cum") >= p50_rank, F.col("cnt"))).alias("p50_cnt"),
            F.min(F.when(F.col("cum") >= p99_rank, F.col("cnt"))).alias("p99_cnt"),
            F.min(F.when(F.col("cnt") == F.col("max_cnt"), F.col("minkey"))).alias(
                "hot_key"
            ),
        )
    )
    return agg.select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "p50_cnt",
        "p99_cnt",
        F.round(
            F.col("max_cnt").cast("double") / F.col("p50_cnt"), 6
        ).alias("skew_ratio"),
        "hot_key",
        # a skew profile of an EMPTY table is undefined: the global agg
        # over the empty histogram emits one all-NULL row where the
        # oracle's grouped form emits none — drop it (inert whenever
        # the input has rows; empty-mode replay r7)
    ).filter(F.col("n_keys").isNotNull())


def fk_orphan_audit(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, fk_col,
    parent, pk_col) constraint, count child rows whose FK value has no
    matching parent row (NULL FKs are not orphans, per SQL FK
    semantics). Output one row per constraint: ``fk_rule``,
    ``n_checked``, ``n_orphans``.

    Scale: each check is a LEFT ANTI join on the key — Spark broadcasts
    the parent when it fits (dimension tables) and falls back to a
    shuffled join otherwise; counts partial-aggregate map-side. The
    per-constraint results are unioned — independent jobs, no shared
    shuffle.
    """
    out = None
    for name, child, fk, parent, pk in pairs:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        checked = child.filter(F.col(fk).isNotNull())
        orphans = checked.join(keys, fk, "left_anti")
        row = (
            checked.agg(F.count(F.lit(1)).alias("n_checked"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(F.lit(name).alias("fk_rule"), "n_checked", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


def expectation_report(
    checks: list[tuple[str, DataFrame, "F.Column"]],
) -> DataFrame:
    """Data-quality expectation suite: each (rule_id, df, predicate)
    is evaluated in ONE scan of its table as a conditional aggregate —
    ``n_rows`` and ``n_violations`` (predicate false or NULL). Rules
    on the same DataFrame object are merged into a single aggregate
    job, so a 20-rule suite over one 100 TB table costs one scan, not
    twenty.
    """
    by_df: dict[int, tuple[DataFrame, list[tuple[str, "F.Column"]]]] = {}
    for rule_id, df, pred in checks:
        by_df.setdefault(id(df), (df, []))[1].append((rule_id, pred))

    out = None
    for df, rules in by_df.values():
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for rule_id, pred in rules:
            aggs.append(
                # COALESCE: SUM over an EMPTY table is NULL, but zero
                # rows have zero violations (the oracle's count(*)
                # formulation is 0 there — empty-mode replay r7)
                F.coalesce(
                    F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1))),
                    F.lit(0),
                ).cast("long").alias(f"__v_{rule_id}")
            )
        wide = df.agg(*aggs)
        # stack the wide 1-row aggregate into per-rule rows INSIDE the
        # same plan (explode of an inline struct array) — the scan and
        # aggregate run once however many rules the table carries
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rule_id).alias("rule_id"),
                            F.col("n_rows").alias("n_rows"),
                            F.col(f"__v_{rule_id}").alias("n_violations"),
                        )
                        for rule_id, _ in rules
                    ]
                )
            ).alias("r")
        ).select("r.rule_id", "r.n_rows", "r.n_violations")
        out = stacked if out is None else out.unionByName(stacked)
    return out


def equi_width_histogram(
    df: DataFrame,
    col: str,
    *,
    n_buckets: int = 20,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one min/max aggregate
    broadcast onto a second scan that buckets every row with pure
    arithmetic — two scans, one combinable exchange, no sort. Bucket
    edges are the same IEEE doubles in any engine (width = (max-min)/k,
    bucket = floor((x-min)/width) clamped to k-1), so counts are
    engine-exact. Output: ``bucket``, ``lo``, ``hi``, ``n``.
    """
    c = F.col(col).cast("double")
    minmax = df.agg(
        F.min(c).alias("mn"), F.max(c).alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_buckets))
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((c - F.col("mn")) / width).cast("int"),
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(minmax))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first(F.col("mn")).alias("__mn"),
            F.first(F.col("mx")).alias("__mx"),
        )
        .select(
            "bucket",
            (F.col("__mn") + F.col("bucket") * (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets))).alias("lo"),
            (F.col("__mn") + (F.col("bucket") + 1) * (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets))).alias("hi"),
            "n",
        )
    )
