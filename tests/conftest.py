"""Shared pytest fixtures: one SparkSession per test run, a DuckDB
connection with the same fixture views the driver registers, and the
oracle-comparison helper replicating the driver's check (row count +
schema width + order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_wasm_bindings_spark.session import get_spark
from datafusion_wasm_bindings_spark.sources.catalog import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dfwb-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison (mirrors the
    driver's order-insensitive value hash in spirit)."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # cut the last couple of noise bits without hiding real diffs
        return round(v, 9) if abs(v) < 1e10 else round(v, 2)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def assert_oracle_match(spark_df, duck_rel, name=""):
    """Compare a Spark DataFrame against a DuckDB relation the way the
    driver does: row count, column-name set, and multiset of rows with
    columns sorted by name."""
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    assert [c.lower() for c in s_cols] == [c.lower() for c in d_cols], (
        f"{name}: column names differ: spark={s_cols} duck={d_cols}"
    )
    s_rows = spark_df.collect()
    d_rows = duck_rel.fetchall()
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    )
    d_index = {c: i for i, c in enumerate(duck_rel.columns)}
    d_order = [d_index[c] for c in sorted(duck_rel.columns, key=str.lower)]
    s_set = Counter(
        tuple(_norm(row[c]) for c in sorted(spark_df.columns, key=str.lower))
        for row in s_rows
    )
    d_set = Counter(tuple(_norm(row[i]) for i in d_order) for row in d_rows)
    if s_set != d_set:
        only_s = list((s_set - d_set).items())[:5]
        only_d = list((d_set - s_set).items())[:5]
        raise AssertionError(
            f"{name}: value multiset differs.\n only in spark: {only_s}\n only in duck: {only_d}"
        )
