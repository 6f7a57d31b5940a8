"""Sampling operators for training-mix construction.

A 100 TB corpus is never trained on wholesale: pipelines draw
per-language / per-source mixtures. Two strategies:

- ``stratified_sample``: Spark's ``sampleBy`` — per-stratum Bernoulli
  with a seed. Statistically clean, but membership depends on Spark's
  RNG stream, so reruns on re-partitioned data can differ at the row
  level (rows-only oracle).
- ``hash_sample``: deterministic content-addressed sampling — keep a
  row iff a stable hash of its key lands under the rate threshold.
  Fully reproducible across runs, partitionings, and engines sharing
  the hash; the standard choice when train/eval splits must never
  leak into each other between pipeline versions.

Both are pure maps: no shuffle, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark ``sampleBy``). Strata absent
    from ``fractions`` are dropped, matching sampleBy semantics."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    salt: str = "dfwb",
) -> DataFrame:
    """Deterministic sample: keep rows where the salted 64-bit hash of
    ``key_col``, mapped to [0,1), is below ``rate``. Changing the salt
    yields an independent sample — disjoint train/eval splits come from
    complementary rate bands over the same salt."""
    u = (F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)
    return df.filter(u < rate)


def md5_threshold(rate: float) -> str:
    """First-8-hex-chars md5 threshold for a keep rate in [0,1]. The 8
    hex chars are a uniform draw over [0, 16^8); a row is kept iff its
    draw is lexicographically below this threshold."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def md5_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    salt: str = "dfwb",
) -> DataFrame:
    """Engine-portable deterministic sample. md5 is standardized, so any
    engine (Spark, DuckDB, Trino, ...) keeps the SAME rows for the same
    key+salt+rate — the property train/eval split pipelines need when
    different systems produce and consume the split. Prefer
    ``hash_sample`` (xxhash64, no cryptographic work) when only
    within-Spark reproducibility matters."""
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    return df.filter(h < F.lit(md5_threshold(rate)))


def temperature_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "dfwb",
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-corpus
    rebalancing rule): sample domains with probability ∝ n_d^alpha,
    alpha < 1 flattening the natural distribution toward uniform. The
    per-row keep rate is r_d = (n_d / n_min)^(alpha-1) — the smallest
    domain keeps everything, larger domains are downsampled by their
    size ratio. Rows are kept by the engine-portable md5 draw (see
    ``md5_sample``), so the selection is reproducible across engines
    and re-partitionings.

    Scale shape: the domain-count pass is a column-pruned scan + tiny
    aggregate; its |domains|-row rate table broadcasts back onto the
    main scan — no shuffle of the corpus itself. The global-min window
    runs over the tiny count relation only.
    """
    from pyspark.sql import Window

    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    rates = counts.withColumn(
        "__minn", F.min("__n").over(Window.partitionBy())
    ).withColumn(
        "__rate", F.pow(F.col("__n") / F.col("__minn"), F.lit(alpha - 1.0))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(16**8))
    )
    return (
        df.join(F.broadcast(rates.select(domain_col, "__rate")), domain_col)
        .filter(u < F.col("__rate"))
        .withColumnRenamed("__rate", "keep_rate")
    )


def md5_stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    salt: str = "dfwb",
) -> DataFrame:
    """Engine-portable stratified sample: per-stratum keep rate applied
    via the same md5 draw as ``md5_sample``. Strata absent from
    ``fractions`` are dropped (CASE yields NULL → filter false),
    matching ``sampleBy`` semantics. Pure map, no shuffle."""
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    thr = None
    for stratum, rate in fractions.items():
        t = F.lit(md5_threshold(rate))
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    return df.filter(h < thr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    *,
    salt: str = "dfwb-w",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res): each row draws a deterministic uniform u ∈ (0,1) from the
    engine-portable md5 recipe and is ranked by ln(u)/w — a monotone
    transform of the classic u^(1/w) key — so the top-n ranks are an
    exact weighted sample. Training mixes use this with w = token
    count to sample documents proportional to their token mass.

    Determinism: u is content-addressed (md5 of key+salt), so the same
    rows are chosen on any engine, run, or partitioning; ties broken
    by key. Scale: the ranking is a pure map and top-n compiles to
    TakeOrderedAndProject (per-partition heap + driver merge of n
    rows, no full sort). Rows with non-positive weight are excluded.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(16**8 + 1))
    rank_key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__k", rank_key)
        .orderBy(F.col("__k").desc(), F.col(key_col))
        .limit(n)
        .drop("__k")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    *,
    fractions: dict[str, float],
    salt: str = "dfwb-split",
) -> DataFrame:
    """Leakage-safe deterministic train/val/test split.

    The md5 draw is over the GROUP key (e.g. the source domain), not the
    row, so every row of a group lands in the same split — near-
    duplicates and templated pages within one source can never straddle
    the train/eval boundary, the leakage mode row-level splits invite.
    ``fractions`` is ordered name→fraction (must sum to 1); assignment
    compares the group's 8-hex md5 draw against cumulative thresholds
    (same engine-portable recipe as ``md5_sample``, so any md5-capable
    system reproduces the identical split).

    Scale: a pure map — no shuffle, no state; at 100 TB the split is
    free at scan time. Adds a ``split`` column.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(
        F.md5(F.concat(F.col(group_col).cast("string"), F.lit(salt))), 1, 8
    )
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(md5_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def epoch_upsample(
    documents: DataFrame,
    *,
    cuts: tuple[tuple[float, int], ...] = ((0.8, 3), (0.6, 2)),
    default_epochs: int = 1,
) -> DataFrame:
    """Quality-weighted epoch upsampling — the "repeat your best data"
    stage of training-mix construction: high-quality documents are
    replicated for several training epochs, low-quality ones seen once.

    Buckets on the composite quality score of
    ``operators.text.quality_scores`` **rounded to 6 dp** (the rounded
    score is bit-identical cross-engine — BASELINE.md determinism
    datapoint — so bucket boundaries cannot flip between engines);
    ``cuts`` is ((min_quality, n_epochs), ...) descending. Each doc is
    exploded to rows epoch = 1..n_epochs.

    Scale: map + explode, no shuffle; output volume = Σ n_epochs, the
    replication you asked for and nothing else. At 100 TB pair it with
    ``deterministic_shuffle`` so repeated epochs don't co-locate.
    """
    from datafusion_wasm_bindings_spark.operators.text import quality_scores

    q = quality_scores(documents).select("doc_id", "quality")
    expr = None
    for thr, n in cuts:
        cond = F.col("quality") >= F.lit(thr)
        expr = F.when(cond, n) if expr is None else expr.when(cond, n)
    n_epochs = (
        F.lit(default_epochs) if expr is None else expr.otherwise(default_epochs)
    ).cast("int")
    return (
        q.withColumn("n_epochs", n_epochs)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("n_epochs"))))
        .select("doc_id", "quality", "n_epochs", "epoch")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int = 8,
    salt: str = "dfwb-shuffle",
) -> DataFrame:
    """Seeded global shuffle for training-data writes: a
    content-addressed permutation of the corpus, materialized as
    ``(key, shard, pos)`` — shard files plus a deterministic order
    within each shard. Changing the salt reshuffles; re-running (on any
    partitioning, any engine with md5) reproduces the exact layout,
    which is what makes training runs resumable and ablations
    comparable.

    shard = first-8-hex-chars of md5(key||salt) mod n_shards (a pure
    map); pos = rank of the full md5 within the shard. The rank runs
    through operators/scale.bucketed_rank on 256 md5-prefix buckets
    (r5 migration, the pack_sequences precedent): a shard-only window
    is one sequential task per shard, while the bucketed two-pass is
    parallel WITHIN shards too — row-identical by the bucketed_rank
    contract (the hex prefix is monotone in the md5 string order).
    There is no global sort and no single-partition bottleneck even
    when ``n_shards`` sits below cluster parallelism.
    """
    from datafusion_wasm_bindings_spark.operators.scale import bucketed_rank

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    staged = df.select(F.col(key_col), h.alias("__h"), shard.alias("shard"))
    ranked = bucketed_rank(
        staged,
        ["shard"],
        F.conv(F.substring(F.col("__h"), 1, 2), 16, 10).cast("long"),
        [F.col("__h").asc(), F.col(key_col).asc()],
        rank_col="__rn",
    )
    return (
        ranked.withColumn("pos", (F.col("__rn") - 1).cast("int"))
        .drop("__h", "__rn")
    )


def per_key_sample(
    df: DataFrame,
    *,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "dfwb-k",
) -> DataFrame:
    """Deterministic fixed-size sample PER KEY: keep the ``n`` rows of
    each key whose content-addressed md5 draw ranks lowest (ties broken
    by id). The distributed equivalent of per-key reservoir sampling —
    any engine, any partitioning, any run keeps the same rows, and no
    reservoir state is needed because the draw is a pure function of
    the row id.

    One exchange on ``key_col``; the rank window sorts only within
    keys (never globally). For heavy keys at 100 TB, pre-filter with a
    conservative md5 threshold (operators.sampling.md5_threshold at a
    few × n/|key| rate) so the window sees a bounded candidate set.
    """
    from pyspark.sql import Window

    draw = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(key_col).orderBy(draw, F.col(id_col))
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= n)
    )


def group_kfold(
    df: DataFrame,
    *,
    group_col: str,
    k: int,
    salt: str = "dfwb-fold",
) -> DataFrame:
    """Leakage-safe k-fold assignment: every row of a group lands in
    the SAME fold (fold = md5 bucket of the group key), so
    cross-validation never trains on a group it validates on — the
    k-way generalization of group_split. Pure map (the fold is a
    function of the row), deterministic across engines and runs.
    """
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col(group_col).cast("string"), F.lit(salt))), 1, 4),
        16,
        10,
    ).cast("long") % k
    return df.withColumn("fold", bucket)
