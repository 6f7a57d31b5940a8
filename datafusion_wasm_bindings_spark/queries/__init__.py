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

# Round-8 driver window (exactly 50 names, COVERAGE.md round-8 plan):
# the backlog is ZERO (287/287 driver-green after r7), so every slot
# is a staleness re-verify — the 50 ids whose LATEST driver verdict is
# oldest, in (last-verified round, registration order): the 39
# r2-stamped greens (dedup cluster pair + embedding, the sim/text/
# sample/stream/multimodal/events extensions block, and the
# functions_agg head q_fn_count..q_fn_struct) plus the 11 stalest
# r3-stamped ids in registration order. Shared infra under all of
# these (catalog normalization, scan-split sizing, compat rewrites,
# _util decimal recipes, operators/dedup.py + similarity.py churn in
# r5-r7) makes actual-driver re-verification the only guard. The
# oldest-first choice is enforced by tests/test_window_rotation.py's
# staleness rule. Names listed here move to the FRONT of the registry
# in this order; everything else follows in registration order.
_WINDOW = (
    "q_dedup_clusters",
    "q_dedup_clusters_star",
    "q_dedup_embedding",
    "q_sim_topk",
    "q_sim_lsh_topk",
    "q_sim_ivf_topk",
    "q_text_tokens",
    "q_text_quality",
    "q_text_langid",
    "q_text_repetition",
    "q_text_fingerprint",
    "q_sample_stratified",
    "q_sample_hash",
    "q_sample_weighted",
    "q_sample_temperature",
    "q_join_asof",
    "q_feature_binning",
    "q_join_range",
    "q_stream_stateful_totals",
    "q_stream_dedup",
    "q_stream_stream_join",
    "q_stream_static_join",
    "q_join_salted",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_multimodal_frames",
    "q_events_tumbling",
    "q_events_sliding",
    "q_events_session",
    "q_text_decontaminate",
    "q_text_pii",
    "q_pipeline_shuffle",
    "q_join_bucketed",
    "q_events_outliers",
    "q_pipeline_chunk",
    "q_fn_count",
    "q_fn_median",
    "q_fn_approx_distinct",
    "q_fn_approx_median",
    "q_fn_approx_percentile",
    "q_fn_array_agg",
    "q_fn_string_agg",
    "q_fn_first_last_value",
    "q_fn_bool_and_or",
    "q_fn_bit_agg",
    "q_fn_stddev_var",
    "q_fn_corr_covar",
    "q_fn_regr",
    "q_fn_greatest_least",
    "q_fn_struct",
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
