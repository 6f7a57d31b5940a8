"""Twelfth-wave extension queries (r5): runtime-filtered joins and two
training-pipeline eval/construction verbs — a Bloom-style semi-join
reduction ahead of a fact⋈dim shuffle, RLHF preference-pair
construction, and exact tie-aware ROC-AUC.

Like the earlier waves these are statements the reference engine
(datafusion-wasm-bindings executes arbitrary SQL through DataFusion,
`/root/reference/src/lib.rs` execute_sql) could run textually; each is
registered with a Spark-first physical shape chosen to survive 1000
executors — the scale notes live on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.operators.scale import hash_prefilter_join
from datafusion_wasm_bindings_spark.queries import query
from datafusion_wasm_bindings_spark.queries._util import dsum, dsum_sql, nsjoin
from datafusion_wasm_bindings_spark.sources.catalog import table


# ================= Bloom-prefiltered fact⋈dim join ====================
def _join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim join with a runtime semi-join reduction: lineitem
    rows are pre-filtered by a broadcast hash-bucket sketch of the
    qualifying part keys BEFORE the join shuffle
    (operators/scale.hash_prefilter_join).

    Scale shape (the 100 TB point of this query): a 1%-selective dim
    filter (Brand#4, small sizes) means 99% of the fact would shuffle
    into the join just to be dropped. The sketch — distinct
    xxhash64(key) mod 2^20 buckets, at most 8 MB broadcast NO MATTER
    how large the dim is (bounded-by-m, never O(|dim|), per the r5
    no-forced-O(|input|)-broadcast rule) — drops those rows at the
    scan, so join-exchange bytes track dim selectivity instead of fact
    size. False-positive buckets pass a few extra rows that the exact
    join then discards: the result is row-identical to the plain join,
    which is exactly what the oracle runs."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    dim = part.filter((F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10))
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .withColumnRenamed("l_partkey", "p_partkey")
    )
    j = hash_prefilter_join(li, dim, "p_partkey")
    return j.groupBy("p_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        dsum(F.col("l_quantity"), "sum_qty"),
    )


query(
    "q_join_bloom",
    f"""
    SELECT p_size,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           {dsum_sql("l_quantity", "sum_qty")}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#4' AND p_size <= 10
    GROUP BY p_size
    """,
    tags=("extension", "join", "scale"),
)(_join_bloom)


# ================= RLHF preference-pair construction ==================
def _pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the RLHF/DPO training-data verb:
    within each candidate group (here (lang, source), standing in for
    a prompt id), emit the best- and worst-scored document as a
    (chosen, rejected) pair with its score margin, dropping groups
    with no preference signal (all candidates tied).

    Scale shape: one grouped aggregate to per-group best/worst (tiny
    |groups| table), a NULL-SAFE broadcast join-back (_util.nsjoin —
    groupBy keeps a NULL lang/source as its own group and the oracle
    joins IS NOT DISTINCT FROM, convention r5(f)), then a second
    combinable aggregate picks the max-doc_id representative at each
    extreme — deterministic under score ties on BOTH engines, no
    window, no per-group sort. Scores are per-row IEEE doubles
    (identical cross-engine); margin subtracts two identical doubles,
    so it is bit-exact without quantization."""
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            (
                (
                    F.length(F.col("text"))
                    - F.length(F.regexp_replace(F.col("text"), " ", ""))
                )
                / F.greatest(F.col("n_chars"), F.lit(1))
            ).alias("score"),
        )
        .filter(F.col("score").isNotNull())
    )
    st = d.groupBy("lang", "source").agg(
        F.max("score").alias("best"), F.min("score").alias("worst")
    )
    j = nsjoin(d, st, ["lang", "source"])
    out = (
        j.groupBy("lang", "source")
        .agg(
            F.max(F.when(F.col("score") == F.col("best"), F.col("doc_id"))).alias(
                "chosen_doc"
            ),
            F.max(F.when(F.col("score") == F.col("worst"), F.col("doc_id"))).alias(
                "rejected_doc"
            ),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            (F.max("best") - F.max("worst")).alias("margin"),
        )
        .filter(F.col("margin") > 0)
    )
    return out


query(
    "q_pipeline_preference_pairs",
    """
    WITH d AS (
      SELECT doc_id, lang, source,
             (length(text) - length(replace(text, ' ', '')))
               / greatest(n_chars, 1) AS score
      FROM documents
    ),
    d2 AS (SELECT * FROM d WHERE score IS NOT NULL),
    st AS (
      SELECT lang, source, MAX(score) AS best, MIN(score) AS worst
      FROM d2 GROUP BY 1, 2
    )
    SELECT d2.lang, d2.source,
           CAST(MAX(CASE WHEN score = best THEN doc_id END) AS BIGINT)
             AS chosen_doc,
           CAST(MAX(CASE WHEN score = worst THEN doc_id END) AS BIGINT)
             AS rejected_doc,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           MAX(best) - MAX(worst) AS margin
    FROM d2 JOIN st
      ON d2.lang IS NOT DISTINCT FROM st.lang
     AND d2.source IS NOT DISTINCT FROM st.source
    GROUP BY 1, 2
    HAVING MAX(best) - MAX(worst) > 0
    """,
    tags=("extension", "pipeline", "behavior"),
)(_pipeline_preference_pairs)


# ================= exact tie-aware ROC-AUC ============================
def _ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the corpus quality classifier (same score and
    label as q_text_pr_curve: 'the'-density vs lang == 'en') via the
    Mann-Whitney rank-sum identity with average ranks for ties —
    the eval-harness companion to the PR-curve threshold sweep.

    AUC = (R⁺ − P(P+1)/2) / (P·N) where R⁺ is the sum of positives'
    average ranks in the score ordering. Everything stays in exact
    integer arithmetic: per distinct score s with n_s rows (p_s
    positive) and c_s rows strictly below, the DOUBLED average rank is
    2c_s + n_s + 1, so 2R⁺ = Σ p_s(2c_s + n_s + 1) is an exact BIGINT
    both engines reproduce; the single surfaced double divides two
    exact integers.

    Scale shape: the global rank prefix c_s is the r4/r5 bucketed
    two-pass prefix sum, NOT a partition-less window — distinct scores
    group (combinable) into monotone value-range buckets (score is a
    per-char density in [0, 1/3], so floor(score·8000) is BOUNDED at
    ≤ 2668 buckets by construction), the bounded bucket table takes
    the exclusive prefix, and in-bucket windows partition by bucket.
    The only partition-less window runs over that bounded bucket
    table (same class as q_events_changepoint's offset table)."""
    d = _score_label(spark, sf_dir)
    return auc_from_scores(d)


def _score_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .select(
            (F.col("lang") == "en").cast("long").alias("label"),
            (
                (
                    F.length(F.lower(F.col("text")))
                    - F.length(
                        F.regexp_replace(F.lower(F.col("text")), "the", "")
                    )
                )
                / F.lit(3.0)
                / F.greatest(F.col("n_chars"), F.lit(1))
            ).alias("score"),
        )
        .filter(F.col("score").isNotNull())
    )
    return d


def auc_from_scores(d: DataFrame, *, bucket_scale: float = 8000.0) -> DataFrame:
    """Exact tie-aware ROC-AUC of a (label∈{0,1}, score double) frame
    via doubled average ranks over distinct scores (see _ml_auc).
    ``bucket_scale`` sets the monotone value-bucket granularity for
    the two-pass prefix sum; any positive value yields identical
    output (bucketing is a distribution knob, never a semantics one —
    the bucketed_rank contract)."""
    g = (
        d.groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("label").cast("long").alias("p"),
        )
        .withColumn("__bkt", F.floor(F.col("score") * bucket_scale).cast("long"))
    )
    bs = g.groupBy("__bkt").agg(F.sum("n").alias("bn"))
    w_pref = (
        Window.orderBy(F.col("__bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bs.select(
        "__bkt", F.coalesce(F.sum("bn").over(w_pref), F.lit(0)).alias("coff")
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("score").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.join(F.broadcast(offs), "__bkt").withColumn(
        "c", F.col("coff") + F.coalesce(F.sum("n").over(w_in), F.lit(0))
    )
    s = r.agg(
        F.sum("p").cast("long").alias("np"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(
            F.col("p") * (2 * F.col("c") + F.col("n") + 1)
        ).cast("long").alias("rs2"),
    )
    return s.select(
        F.col("np").alias("n_pos"),
        (F.col("nt") - F.col("np")).alias("n_neg"),
        (
            (F.col("rs2") - F.col("np") * (F.col("np") + 1)).cast("double")
            / (2 * F.col("np") * (F.col("nt") - F.col("np"))).cast("double")
        ).alias("auc"),
    )


query(
    "q_ml_auc",
    """
    WITH d AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
             (length(lower(text)) - length(replace(lower(text), 'the', '')))
               / 3.0 / greatest(n_chars, 1) AS score
      FROM documents
    ),
    d2 AS (SELECT * FROM d WHERE score IS NOT NULL),
    g AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS p
      FROM d2 GROUP BY score
    ),
    r AS (
      SELECT n, p,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS c
      FROM g
    ),
    s AS (
      SELECT CAST(SUM(p) AS BIGINT) AS np,
             CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(p * (2 * c + n + 1)) AS BIGINT) AS rs2
      FROM r
    )
    SELECT np AS n_pos, nt - np AS n_neg,
           CAST(rs2 - np * (np + 1) AS DOUBLE)
             / CAST(2 * np * (nt - np) AS DOUBLE) AS auc
    FROM s
    """,
    tags=("extension", "stats", "ml"),
)(_ml_auc)
