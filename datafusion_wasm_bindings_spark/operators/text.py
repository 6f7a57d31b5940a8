"""Text-analysis operators for training-data pipelines (north star):
language ID, quality scoring, token counting, document fingerprinting.

Everything is built-in-function DataFrame code (codegen'd, no Python
in the hot path) so the same pipeline runs unchanged over 100 TB of
documents: all operators are pure maps except lang-ID's broadcast
lexicon join and the per-doc aggregations, which combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# Tiny built-in stopword lexicons for the n-gram/stopword language
# heuristic. Real pipelines plug in fastText-style models via
# mapInPandas; the *plumbing* (broadcast lexicon + argmax) is what
# scales, not the word lists.
LANG_LEXICON: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "for", "with", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "por", "que", "una", "en"),
}


def tokens_col(text_col: str = "text") -> F.Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace + regex token counting (north-star 'token counting').

    ws_tokens: split on whitespace runs; re_tokens: alnum runs (a
    BPE-ish pre-tokenizer grain); chars from length().
    """
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("ws_tokens"),
        F.size(tokens_col()).alias("re_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_given"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score ∈ [0,1]:
    length band, alpha ratio, mean token length, stopword ratio —
    the standard cheap pre-filters before model-based scoring.
    """
    toks = tokens_col()
    n_tok = F.size(toks)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    en_stop = F.array([F.lit(w) for w in LANG_LEXICON["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_tok_len = F.when(n_tok > 0, alpha_chars / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_chars / F.lit(400.0), F.lit(1.0)) * 0.3
        + (alpha_chars / F.greatest(n_chars, F.lit(1))) * 0.3
        + F.least(n_stop / F.greatest(n_tok, F.lit(1)) * 4.0, F.lit(1.0)) * 0.2
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 8), 0.2).otherwise(0.0)
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(alpha_chars / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def language_id(documents: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Stopword-lexicon language ID: explode tokens, broadcast-join the
    lexicon, count hits per (doc, lang), argmax with deterministic
    tiebreak, 'und' (undetermined) when nothing matches.

    The lexicon join broadcasts (~40 rows); the only real shuffle is
    the per-doc regroup — both survive any corpus size.
    """
    spark = spark or documents.sparkSession
    lex_rows = [(lang, w) for lang, words in LANG_LEXICON.items() for w in words]
    lexicon = spark.createDataFrame(lex_rows, "lang_cand string, tok string")
    toks = documents.select("doc_id", F.explode(tokens_col()).alias("tok"))
    hits = (
        toks.join(F.broadcast(lexicon), "tok")
        .groupBy("doc_id", "lang_cand")
        .agg(F.count("*").alias("hits"))
    )
    # deterministic argmax: highest hit count, ties broken by the
    # lexicographically greatest language code
    best = hits.groupBy("doc_id").agg(
        F.expr("max_by(lang_cand, struct(hits, lang_cand))").alias("lang_pred"),
        F.max("hits").alias("best_hits"),
    )
    return (
        documents.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("best_hits", F.lit(0)).alias("best_hits"),
            "lang",
        )
    )


def corpus_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus rollup (SURVEY.md §7.6 `q_text_stats`):
    doc counts, char/token totals and means, distinct sources.

    One map stage (length/size are codegen'd) + one partial-combining
    groupBy on `lang` (~5 groups): bytes shuffled are O(partitions ×
    languages), independent of corpus size.
    """
    per_doc = documents.select(
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        F.size(tokens_col()).alias("n_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy(F.col("lang").asc_nulls_last())
    )


def fingerprints(documents: DataFrame, modulus: int = 1_000_000_007) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the document's token
    stream: fp = Σ tok_i · 31^i (mod p), computed as a left fold.

    Uses engine-portable arithmetic only (no murmur3): token value =
    Σ ascii(char)·131^j mod p via nested aggregate — identical in the
    DuckDB oracle. Pure map, no shuffle.
    """
    p = F.lit(modulus)

    def char_fold(tok: F.Column) -> F.Column:
        return F.aggregate(
            F.split(tok, ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 131 + F.ascii(ch)) % p,
        )

    fp = F.aggregate(
        tokens_col(),
        F.lit(0).cast("long"),
        lambda acc, tok: (acc * 31 + char_fold(tok)) % p,
    )
    return documents.select("doc_id", fp.alias("fingerprint"))
