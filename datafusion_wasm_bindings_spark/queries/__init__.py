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

# Round-11 driver window (exactly 50 names, COVERAGE.md round-11 plan):
# ONE never-checked id first (q_pipeline_cluster_split, added mid-r11
# — the never-checked-first rule, q_pipeline_split_leakage precedent;
# q_events_ewma returned to the pool to make room), then staleness
# re-verification — the stalest greens oldest-first (last-verified
# round, registration order) per the mechanical rule enforced by
# tests/test_window_rotation.py — the r5-stamped wave-4..9 block
# (remaining TPC-H q16/q20/q21, pivot/unpivot/qualify/lateral, the
# events funnel/retention/markov/attribution family, the pipeline
# scd2/diff/folds/manifest ids, text bm25/normalize/perplexity/
# pr_curve, stream_upsert, fn_udtf, union_by_name, the scale
# compaction/balanced_write pair) then the stalest r6 greens in
# registration order. The wave-4..9 oracles predate the r9
# ceil/floor/sign dtype-parity and exactness-bound revisions, so the
# rotation was preceded by the conftest ORACLE_UNSAFE_TYPES + dtype
# audit (tools_driver_sim.py over all 50). Names listed here move to
# the FRONT of the registry in this order; everything else follows in
# registration order.
_WINDOW = (
    "q_pipeline_cluster_split",
    "q_tpch_q16",
    "q_tpch_q21",
    "q_tpch_q20",
    "q_pivot",
    "q_unpivot",
    "q_qualify",
    "q_agg_groupby_all",
    "q_join_lateral",
    "q_events_funnel",
    "q_events_retention",
    "q_pipeline_scd2",
    "q_scale_compaction",
    "q_text_editdist_join",
    "q_sample_per_key",
    "q_graph_triangles",
    "q_pipeline_manifest",
    "q_text_bm25",
    "q_profile_fk",
    "q_profile_expectations",
    "q_events_rolling",
    "q_pipeline_folds",
    "q_pipeline_diff",
    "q_events_experiment",
    "q_profile_histogram",
    "q_fn_udtf",
    "q_stream_upsert",
    "q_pipeline_rownum",
    "q_events_interval_merge",
    "q_events_markov",
    "q_events_attribution",
    "q_clean_winsorize",
    "q_text_normalize",
    "q_union_by_name",
    "q_scale_balanced_write",
    "q_events_gapfill",
    "q_text_pr_curve",
    "q_pipeline_incremental_dedup",
    "q_events_windowed_funnel",
    "q_text_perplexity",
    "q_graph_pagerank",
    "q_join_inner",
    "q_agg_groupby",
    "q_win_ranking",
    "q_events_active_users",
    "q_events_rfm",
    "q_pipeline_negatives",
    "q_graph_bfs",
    "q_join_spatial",
    "q_multimodal_dedup",
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
) -> None:
    """Register a query whose Spark side is a SQL string.

    ``oracle="same"`` (default) reuses the identical text for DuckDB —
    valid only where the dialects agree; pass an explicit string where
    they diverge, or None for rows-only.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

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
