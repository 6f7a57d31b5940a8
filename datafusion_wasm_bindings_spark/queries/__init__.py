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


QUERIES: dict[str, QuerySpec] = {}

# Registration order drives the round driver's CORRECTNESS window (it
# verifies the first 50 registered queries). Round 1 verified the
# flagship→sorts block green (CORRECTNESS_r01); round 2 rotates the
# still-unverified modules to the front — extensions (the LLM-pipeline
# operator set) and the function catalogs first — so the driver's hard
# signal reaches them. The already-green block re-verifies in a later
# rotation.
_MODULES = (
    "extensions",
    "functions_agg",
    "functions_scalar",
    "sources_q",
    "statements",
    "flagship",
    "relational",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "sorts",
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
        QUERIES[name] = QuerySpec(name, wrapped, oracle, headline, tags)
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

    fn.__name__ = name
    QUERIES[name] = QuerySpec(name, fn, sql if oracle == "same" else oracle, headline, tags)


def resolve_oracle(oracle: str | None, sf_dir: str) -> str | None:
    """Fill the ``{TAG}`` placeholder some file-path-bearing oracles
    carry (CSV/JSON/COPY fixtures live under /tmp/<sf-tag>/…) with the
    scale-factor tag of the directory being queried."""
    if oracle is None:
        return None
    tag = __import__("os").path.basename(__import__("os").path.normpath(sf_dir)) or "sf"
    return oracle.replace("{TAG}", tag)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(f"datafusion_wasm_bindings_spark.queries.{mod}")
        except ModuleNotFoundError as e:
            # tolerate not-yet-written modules during incremental build
            if f"queries.{mod}" not in str(e):
                raise
    return QUERIES
