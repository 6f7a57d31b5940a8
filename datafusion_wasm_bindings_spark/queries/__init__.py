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

# Round-10 driver window (exactly 50 names, COVERAGE.md round-10 plan):
# ONE never-checked id first (q_pipeline_split_leakage, added mid-r10
# — the never-checked-first rule, q_dedup_substring precedent), then
# staleness re-verification — the stalest greens oldest-first per the
# mechanical rule enforced by tests/test_window_rotation.py: the 38
# r4-stamped ids (cluster/profile/scale/pipeline families, the fn
# exotic-type block variant/map_ops/pandas_udaf/url_parse, the
# ORC/text/evolution scans, TPC-H q4/q6/q7/q8/q10) then the 11
# stalest r5-stamped ids in registration order (the remaining TPC-H
# block; q_tpch_q16 returned to the pool when the never-checked id
# took its slot). The r4 oracles predate the ceil/floor/sign dtype-parity
# rules, so the rotation was preceded by the conftest
# ORACLE_UNSAFE_TYPES + dtype audit (tools_driver_sim.py over all 50).
# Names listed here move to the FRONT of the registry in this order;
# everything else follows in registration order.
_WINDOW = (
    "q_pipeline_split_leakage",
    "q_pipeline_training_mix",
    "q_pipeline_pack",
    "q_profile_columns",
    "q_profile_columns_approx",
    "q_events_json_quarantine",
    "q_scale_incremental_agg",
    "q_text_heavy_hitters",
    "q_profile_skew",
    "q_text_classifier",
    "q_scale_hll_shards",
    "q_scale_zorder",
    "q_cluster_kmeans",
    "q_cluster_quality",
    "q_pipeline_upsert",
    "q_fn_sum_avg_min_max",
    "q_fn_weighted_percentile",
    "q_fn_bitmap_distinct",
    "q_fn_argminmax",
    "q_fn_pandas_udaf",
    "q_fn_try_arith",
    "q_fn_url_parse",
    "q_fn_map_ops",
    "q_fn_variant",
    "q_fn_collation",
    "q_fn_stringdist",
    "q_scan_evolution",
    "q_scan_orc",
    "q_scan_text",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_fn_bitwise",
    "q_fn_array_ops",
    "q_fn_higher_order",
    "q_dedup_pipeline",
    "q_dedup_containment",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
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
