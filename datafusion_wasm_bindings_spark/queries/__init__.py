"""Oracle-checked query registry — one entry per operator row in
SURVEY.md §2 (plus §7.6 extensions).

Each registered query is a pair:
- a Spark implementation ``(spark, sf_dir) -> DataFrame`` (DataFrame
  API or Spark SQL — Catalyst produces the same plan either way), and
- an ANSI-SQL oracle string DuckDB runs over the same parquet views
  (or ``None`` for genuinely non-SQL-expressible operators → the
  driver records a weaker rows-only check).

Determinism conventions (FIXTURES.md "Determinism rules"):
- every computed column aliased identically on both sides;
- money-sum aggregates go through DECIMAL(18,2) so the sum is exact
  and order-independent, then cast back to DOUBLE;
- explicit NULLS FIRST/LAST whenever ORDER BY feeds a LIMIT;
- timestamps surfaced as DATE or epoch numbers, never raw timestamps.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datafusion_wasm_bindings_spark.sources.catalog import register_tables


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    module: str = ""  # defining module — drives the oracle-edit sim gate


QUERIES: dict[str, QuerySpec] = {}

# Registration order drives the round driver's CORRECTNESS window (it
# verifies the first 50 registered queries). Round 1 verified the
# flagship→sorts block green (CORRECTNESS_r01); round 2 put extensions
# + the functions_agg head through (43 green, 7 oracle-HUGEINT fails
# since fixed). Module order is now only the fallback — the window is
# chosen query-granularly via _WINDOW below, driven by COVERAGE.md's
# per-id "last verified round" ledger.
_MODULES = (
    "extensions",
    "functions_agg",
    "functions_scalar",
    "sources_q",
    "statements",
    "flagship",
    "flagship2",
    "relational",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "sorts",
    "analytics",
    "analytics2",
    "analytics3",
    "analytics4",
    "analytics5",
)

# Round-12 driver window (exactly 50 names, COVERAGE.md round-12 plan):
# zero never-checked / non-green ids remain (290/290 cumulative-green
# since r11), so the whole window is staleness re-verification — the
# stalest greens oldest-first (last-verified round, registration
# order) per the mechanical rule enforced by
# tests/test_window_rotation.py: the r6-stamped block (the events
# ewma/anomaly/cuped/changepoint/ltv/forecast family, the stats
# entropy/chi2/ols2/benford/gini/kappa/survival/power suite, the ml
# target/feature-hash/calibration/woe/auc/ks/psi encoders, pipeline
# curation/forget/itemsets/preference_pairs, profile kanon/drift/
# dp_counts/boxplot, sampling balanced/neyman, sales yoy/pareto,
# rank ndcg/rrf, win_distinct_running, join_bloom,
# text_bpe_merges, dedup_semantic) then the r7-stamped head in
# registration order (the exact/minhash/simhash/ngram dedup quartet,
# fn_null_handling, the three flagship headliners, project/filter).
# Rotation preceded by the conftest ORACLE_UNSAFE_TYPES + dtype
# audit (tools_driver_sim.py over all 50). Names listed here move to
# the FRONT of the registry in this order; everything else follows in
# registration order.
_WINDOW = (
    "q_events_ewma",
    "q_pipeline_curation",
    "q_profile_kanon",
    "q_pipeline_forget",
    "q_pipeline_itemsets",
    "q_profile_drift",
    "q_events_forecast_backtest",
    "q_join_interval_overlap",
    "q_sample_balanced",
    "q_stats_entropy_mi",
    "q_stats_chi2",
    "q_stats_ols2",
    "q_stats_benford",
    "q_ml_target_encode",
    "q_ml_feature_hash",
    "q_stats_gini",
    "q_events_anomaly_mad",
    "q_rank_ndcg",
    "q_stats_kappa",
    "q_ml_calibration",
    "q_stats_survival",
    "q_events_cuped",
    "q_ml_woe_encode",
    "q_text_bpe_merges",
    "q_profile_dp_counts",
    "q_profile_boxplot",
    "q_sales_yoy",
    "q_sales_pareto",
    "q_events_ltv_cohort",
    "q_sample_neyman",
    "q_events_changepoint",
    "q_stats_power",
    "q_win_distinct_running",
    "q_join_bloom",
    "q_pipeline_preference_pairs",
    "q_ml_auc",
    "q_ml_ks_drift",
    "q_ml_psi",
    "q_rank_rrf",
    "q_dedup_semantic",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_fn_null_handling",
    "q_flagship_pricing_summary",
    "q_flagship_shipping_priority",
    "q_flagship_local_supplier",
    "q_project",
    "q_filter",
)


def query(
    name: str,
    oracle: str | None = None,
    *,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator registering a DataFrame-API query implementation."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(name, wrapped, oracle, headline, tags, fn.__module__)
        return fn

    return deco


def sql_query(
    name: str,
    sql: str,
    oracle: str | None = "same",
    *,
    headline: bool = False,
    tags: tuple[str, ...] = (),
    parallel_tables: tuple[str, ...] = (),
) -> None:
    """Register a query whose Spark side is a SQL string.

    ``oracle="same"`` (default) reuses the identical text for DuckDB —
    valid only where the dialects agree; pass an explicit string where
    they diverge, or None for rows-only.

    ``parallel_tables`` names fact tables whose scan should widen when
    the fixture layout serializes it (catalog.table(parallel=True),
    r12 guide §2.5): the Spark side runs the SAME SQL text over a
    scoped temp view of the widened scan — the expression tree the r9
    shared-string convention relies on is untouched (only the scan
    node under it changes), and the ORACLE text keeps the original
    table name. Opt in only on measured wins (decimal-moment
    aggregates: q_fn_corr_covar 1.76→0.97 s at sf0.1); the exchange
    is a no-op at healthy row-group layouts by construction.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        text = sql
        if parallel_tables:
            import re

            from datafusion_wasm_bindings_spark import scratch
            from datafusion_wasm_bindings_spark.sources.catalog import table as _table

            for t in parallel_tables:
                view = f"{t}_par_{scratch.scope()}"
                _table(spark, sf_dir, t, parallel=True).createOrReplaceTempView(view)
                text = re.sub(rf"\b{t}\b", view, text)
        return spark.sql(text)

    import sys as _sys

    fn.__name__ = name
    QUERIES[name] = QuerySpec(
        name,
        fn,
        sql if oracle == "same" else oracle,
        headline,
        tags,
        _sys._getframe(1).f_globals.get("__name__", ""),
    )


def resolve_oracle(oracle: str | None, sf_dir: str) -> str | None:
    """Fill the ``{TAG}`` placeholder some file-path-bearing oracles
    carry (CSV/JSON/COPY fixtures live under /tmp/<sf-tag>/…) with the
    scale-factor tag of the directory being queried."""
    if oracle is None:
        return None
    tag = __import__("os").path.basename(__import__("os").path.normpath(sf_dir)) or "sf"
    return oracle.replace("{TAG}", tag)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    reordered so the driver's 50-slot verification window is exactly
    the ids named in ``_WINDOW`` (then everything else in registration
    order)."""
    for mod in _MODULES:
        try:
            importlib.import_module(f"datafusion_wasm_bindings_spark.queries.{mod}")
        except ModuleNotFoundError as e:
            # tolerate not-yet-written modules during incremental build
            if f"queries.{mod}" not in str(e):
                raise
    ordered = {n: QUERIES[n] for n in _WINDOW if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    # in-place so references to QUERIES elsewhere observe the new order
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES
