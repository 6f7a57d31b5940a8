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

# Round-13 driver window (exactly 50 names, COVERAGE.md round-13 plan):
# zero never-checked / non-green ids remain (290/290 cumulative-green),
# so the whole window is staleness re-verification — the stalest
# greens oldest-first (last-verified round, registration order) per
# the mechanical rule enforced by tests/test_window_rotation.py: the
# r7-stamped SURVEY §2 relational/join/agg/window/setop/sort block
# (predicates/like/case/cast, scalar_subquery/exists_in, the seven
# join variants + theta/residual/using, the agg global/having/
# distinct/grouping-sets/rollup/cube/filter-clause suite, the window
# lag-lead/value-fns/agg-over/frames/named family, union/intersect/
# except incl. ALL forms, distinct/distinct_on/sort/limit_offset/
# topk) then the r8-stamped dedup-cluster pair, dedup_embedding, the
# sim topk/lsh/ivf trio, and the text tokens/quality/langid/
# repetition quartet. Rotation preceded by the conftest
# ORACLE_UNSAFE_TYPES + dtype audit (tools_driver_sim.py over all
# 50). Names listed here move to the FRONT of the registry in this
# order; everything else follows in registration order.
_WINDOW = (
    "q_predicates",
    "q_like_ilike",
    "q_case",
    "q_cast",
    "q_scalar_subquery",
    "q_exists_in",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_join_residual",
    "q_join_using",
    "q_agg_global",
    "q_agg_having",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_filter_clause",
    "q_win_lag_lead",
    "q_win_value_fns",
    "q_win_agg_over",
    "q_win_rows_frame",
    "q_win_range_frame",
    "q_win_groups_frame",
    "q_win_named",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_intersect_all",
    "q_except_all",
    "q_distinct",
    "q_distinct_on",
    "q_sort",
    "q_limit_offset",
    "q_topk",
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


def _swap_table_refs(text: str, table: str, view: str) -> str:
    """Replace whole-word references to ``table`` with ``view``, never
    touching string literals or comments (the compat scanner's r5
    masking convention — ADVICE r12 on sql_query's raw re.sub): one
    left-to-right scan masks '…' literals (with '' escapes) and
    ``--`` / ``/* */`` comments behind \\x00 placeholders, the
    word-boundary substitution runs on the masked text only, and the
    masked spans are restored verbatim."""
    import re

    spans: list[str] = []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append(text[i : min(j + 1, n)])
            out.append(f"\x00{len(spans) - 1}\x00")
            i = j + 1
        elif c == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j < 0 else j
            spans.append(text[i:j])
            out.append(f"\x00{len(spans) - 1}\x00")
            i = j
        elif c == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n if j < 0 else j + 2
            spans.append(text[i:j])
            out.append(f"\x00{len(spans) - 1}\x00")
            i = j
        else:
            out.append(c)
            i += 1
    masked = re.sub(rf"\b{re.escape(table)}\b", view, "".join(out))
    return re.sub(r"\x00(\d+)\x00", lambda m: spans[int(m.group(1))], masked)


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
            from datafusion_wasm_bindings_spark import scratch
            from datafusion_wasm_bindings_spark.sources.catalog import table as _table

            for t in parallel_tables:
                view = f"{t}_par_{scratch.scope()}"
                _table(spark, sf_dir, t, parallel=True).createOrReplaceTempView(view)
                text = _swap_table_refs(text, t, view)
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
