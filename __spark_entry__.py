"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``datafusion_wasm_bindings_spark.queries``;
this file only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_wasm_bindings_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datafusion_wasm_bindings_spark.queries.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query id (omit => rows-only check).

    The driver's oracle comparison runs at sf=0.01 (TESTDATA.md), so
    file-path-bearing oracles resolve their {TAG} placeholder to sf0.01.
    """
    from datafusion_wasm_bindings_spark.queries import resolve_oracle

    # materialize the CSV/NDJSON scan fixtures for the oracle's scale
    # factor up front: their oracles read the files directly, and the
    # driver may evaluate an oracle before the matching Spark query
    # (which would otherwise be what creates the files)
    from datafusion_wasm_bindings_spark.queries.sources_q import _ensure_text_fixtures

    _ensure_text_fixtures("/root/testdata/sf0.01")

    return {
        name: resolve_oracle(spec.oracle, "/root/testdata/sf0.01")
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
