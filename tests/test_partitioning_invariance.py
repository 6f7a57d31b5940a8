"""Whole-query partitioning invariance: a distributed engine's results
must not depend on HOW the data was partitioned — shuffle partition
count, AQE coalescing/re-planning — only on the data. Every repo
determinism recipe (decimal sums, content-addressed draws, explicit
tie-breaks, two-pass bucketed ranks) exists to guarantee exactly this;
here it is asserted end-to-end on a cross-section of query shapes:
exact-decimal aggregation, bucketed rank rewrites, order statistics,
prefix sums, MinHash dedup, TF-IDF top-k, and KM survival.

Each query runs under spark.sql.shuffle.partitions in {2, 8, 64} and
once more with AQE disabled; all four row sets must be IDENTICAL
(values included — not just row counts).
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import load_all

REGISTRY = load_all()

_IDS = (
    "q_flagship_pricing_summary",  # 8 exact decimal aggregates
    "q_stats_gini",                # value-bucketed two-pass rank
    "q_clean_winsorize",           # order-statistic bounds
    "q_events_changepoint",        # bucketed decimal prefix sum + argmax
    "q_win_distinct_running",      # bucketed integer prefix sum
    "q_dedup_minhash",             # banded LSH + exact verify
    "q_text_tfidf",                # tf-idf top-k with tie-breaks
    "q_stats_survival",            # KM product over the hour grid
    "q_pipeline_rownum",           # global row ids without global window
    "q_ml_auc",                    # doubled-rank AUC over bucketed prefix sum
    "q_join_bloom",                # semi-filter row-identity under AQE on/off
    "q_ml_ks_drift",               # two-CDF bucketed prefix sums + exact argmax
    "q_ml_psi",                    # quantized-term decimal sum over bounded bins
    "q_rank_rrf",                  # two bucketed global ranks + fused top-k
    "q_dedup_semantic",            # iterative fit + broadcast rep scoring
    # r5 de-hinting pass: join strategy is now AQE-chosen for these,
    # so row-identity under AQE on/off is the contract being asserted
    "q_text_perplexity",           # vocab LM probs join (was hinted)
    "q_pipeline_itemsets",         # per-item margin joins (was hinted)
    "q_pipeline_forget",           # delete-list anti/semi join (was hinted)
    "q_fn_corr_covar",             # r12 widened-scan decimal moments (parallel_tables)
)


def test_sql_query_parallel_tables_matches_plain_scan(spark, sf_dir):
    """r12 sql_query(parallel_tables=...): the Spark side runs the SAME
    SQL text over a temp view of the width-adapted scan. Contract:
    (a) the ORACLE string keeps the plain table reference (no scoped
    view name leaks into what DuckDB runs), and (b) executing the
    widened form yields rows bit-identical to the plain-scan SQL —
    the repartition is a pure physical change."""
    from datafusion_wasm_bindings_spark.sources.catalog import register_tables

    for qid in ("q_fn_corr_covar", "q_fn_regr"):
        spec = REGISTRY[qid]
        assert "FROM lineitem" in spec.oracle, qid
        assert "_par_" not in spec.oracle, qid
        register_tables(spark, sf_dir)
        widened = _canon(spec.spark_fn(spark, sf_dir).collect())
        plain = _canon(spark.sql(spec.oracle).collect())
        assert widened == plain, qid


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_swap_table_refs_masks_literals_and_comments():
    """r13 hardening (ADVICE r12): sql_query(parallel_tables=...) must
    rewrite only real table references — a table name inside a string
    literal, '' escape, -- line comment, or /* block */ comment stays
    byte-identical, and word-boundary matching still skips prefixed
    names (lineitem_ext)."""
    from datafusion_wasm_bindings_spark.queries import _swap_table_refs

    sql = (
        "SELECT 'lineitem' AS lbl, 'it''s lineitem' AS esc, l_orderkey\n"
        "-- lineitem mentioned in a comment\n"
        "/* block: lineitem */\n"
        "FROM lineitem JOIN lineitem_ext ON 1=1 WHERE x = 'FROM lineitem'"
    )
    out = _swap_table_refs(sql, "lineitem", "lineitem_par_42")
    assert "FROM lineitem_par_42 JOIN" in out
    assert "'lineitem'" in out                      # literal untouched
    assert "'it''s lineitem'" in out                # escaped literal untouched
    assert "-- lineitem mentioned in a comment" in out
    assert "/* block: lineitem */" in out
    assert "lineitem_ext" in out                    # word boundary respected
    assert "'FROM lineitem'" in out                 # literal containing keyword
    # exactly one real reference was swapped
    assert out.count("lineitem_par_42") == 1


def test_results_invariant_to_shuffle_partitions_and_aqe(spark, sf_dir):
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for qid in _IDS:
            spec = REGISTRY[qid]
            results = []
            for parts, aqe in ((2, "true"), (8, "true"), (64, "true"), (8, "false")):
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                results.append(_canon(spec.spark_fn(spark, sf_dir).collect()))
            for other in results[1:]:
                assert other == results[0], (
                    f"{qid} result depends on partitioning/AQE"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
