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

# Round-9 driver window (exactly 50 names, COVERAGE.md round-9 plan):
# ONE never-checked id first (q_dedup_substring, added mid-r9 — the
# never-checked-first rule), then staleness re-verifies — the 38
# r3-stamped ids (the scalar-fn math/string/datetime/encoding block,
# the scan/copy/values/statements source family, q_agg_order_within,
# q_dedup_paragraph) plus the 11 stalest r4-stamped ids in
# registration order, per the mechanical oldest-first rule enforced by
# tests/test_window_rotation.py. The r3
# oracles predate the HUGEINT/ceil-floor/sign dtype-parity rules, so the
# rotation was preceded by the conftest ORACLE_UNSAFE_TYPES + dtype
# audit (tools_driver_sim.py over all 50). Names listed here move to the
# FRONT of the registry in this order; everything else follows in
# registration order.
_WINDOW = (
    "q_dedup_substring",
    "q_fn_math_basic",
    "q_fn_math_log_trig",
    "q_fn_math_gaps",
    "q_fn_typeof_version",
    "q_fn_string_basic",
    "q_fn_string_pad_trim",
    "q_fn_string_search",
    "q_fn_unicode",
    "q_fn_regex",
    "q_fn_datetime_extract",
    "q_fn_datetime_trunc_bin",
    "q_fn_datetime_convert",
    "q_fn_interval_arith",
    "q_fn_to_char",
    "q_fn_encoding",
    "q_scan_parquet",
    "q_scan_csv",
    "q_scan_arrow",
    "q_scan_json",
    "q_values_inline",
    "q_values_ctas",
    "q_generate_series",
    "q_info_schema",
    "q_copy_parquet",
    "q_copy_csv",
    "q_copy_json",
    "q_scan_partitioned",
    "q_insert_into",
    "q_result_table",
    "q_result_json",
    "q_unnest",
    "q_multi_statement",
    "q_cte",
    "q_recursive_cte",
    "q_recursive_cte_loop",
    "q_prepared",
    "q_ddl_view",
    "q_agg_order_within",
    "q_dedup_paragraph",
    "q_sim_pq_topk",
    "q_sim_truncation",
    "q_text_tokens_bpe",
    "q_text_tfidf",
    "q_text_confusion",
    "q_text_stats",
    "q_pipeline_split",
    "q_pipeline_epochs",
    "q_events_props_json",
    "q_stream_session",
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
