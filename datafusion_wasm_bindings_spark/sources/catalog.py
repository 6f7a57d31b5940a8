"""Test-fixture table registration (TESTDATA.md / FIXTURES.md §B).

The driver generates a TPC-H-ish star schema plus events/documents/
embeddings as one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``. Oracle-checked queries address
them as temp views so the same SQL text can run on Spark and on the
DuckDB oracle (which pre-registers views of the same files).

``spark.read.parquet`` is the reference's parquet scan equivalent
(CREATE EXTERNAL TABLE ... STORED AS PARQUET, SURVEY.md §2.1):
self-describing schema, projection + predicate pushdown, row-group
pruning — all free from Spark's vectorized parquet reader.

Scale note: a temp view over a parquet directory is a pure logical
binding — no data movement at registration. At 100 TB the same call
binds a partitioned directory tree and partition pruning applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

# last sf_dir registered per SparkSession id, to skip redundant re-reads
_registered: dict[int, str] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark's reader surfaces
    it as a long (``spark.sql.legacy.parquet.nanosAsLong``, session.py)
    and we truncate to µs here — the repo-wide timestamp policy
    (FIXTURES.md), matched by ``CAST(ts AS TIMESTAMP)`` on the DuckDB
    oracle side. The truncation is a cheap projection; the pushdown
    loss on ts-filters is confined to this one fixture column.
    """
    if name == "events":
        # the driver hands us ITS SparkSession (no session.py configs);
        # without this, the ns-timestamp column aborts the read outright
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed 2^53 so a double
        # round-trip would corrupt the low microseconds
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_tables(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Bind the fixture tables as temp views named after themselves.

    Idempotent and cached per (session, sf_dir): re-binding the same
    directory is skipped so per-query overhead stays at dict lookups.
    """
    key = id(spark)
    if not force and _registered.get(key) == sf_dir:
        return
    if not os.path.isdir(sf_dir):
        # without this, a bad sf_dir would silently keep the previous
        # registration's views bound — wrong data, no error
        raise FileNotFoundError(f"scale-factor directory does not exist: {sf_dir}")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
    _registered[key] = sf_dir
