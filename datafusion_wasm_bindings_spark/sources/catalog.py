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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce a parquet TIMESTAMP(NANOS) column to session-tz
    ``TimestampType`` µs — the repo-wide ns→µs policy (FIXTURES.md),
    matched by ``CAST(ts AS TIMESTAMP)`` on the DuckDB oracle side.

    Spark surfaces parquet nanos differently by version: as a long
    under ``spark.sql.legacy.parquet.nanosAsLong`` (measured on the
    shipped 4.1.2: the conf is honored, and WITHOUT it a NANOS column
    is rejected outright with PARQUET_TYPE_ILLEGAL — the conf-setting
    in ``table()`` is load-bearing), or natively as ``TIMESTAMP_NTZ``
    on versions that read ns directly. Both branches land on the same
    µs instants here (`div 1000` truncates toward zero — pinned with
    pre-1970 boundary values in tests/test_engine.py
    test_ns_timestamp_truncates_to_micros_policy); functions that
    require TIMESTAMP proper (``unix_micros``, ``withWatermark``) then
    work uniformly. The NTZ→TZ cast is value-preserving because the
    session timezone is UTC.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        # integer `div`, not `/`: epoch-nanos exceed 2^53 so a double
        # round-trip would corrupt the low microseconds
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS) → normalized to µs
    ``TimestampType`` (see normalize_event_ts). The conversion is a
    cheap projection; the pushdown loss on ts-filters is confined to
    this one fixture column.
    """
    if name == "events":
        # the driver hands us ITS SparkSession (no session.py configs);
        # on Spark 3.x the ns-timestamp column aborts the read without
        # this legacy conf (4.x reads it as TIMESTAMP_NTZ and ignores it)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_event_ts's NTZ→TIMESTAMP cast is value-preserving
        # only under a UTC session tz; a non-UTC driver JVM would shift
        # every events instant away from the UTC-naive DuckDB oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
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
    # UNCONDITIONAL UTC pin (not just when events is read): epoch
    # surfacing (unix_seconds/unix_micros over casts of DATE/TIMESTAMP
    # columns) is tz-sensitive for EVERY table, and the driver hands us
    # its own session without our session.py configs. A non-UTC driver
    # JVM would shift all epoch outputs away from the UTC-naive DuckDB
    # oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if not os.path.isdir(sf_dir):
        # without this, a bad sf_dir would silently keep the previous
        # registration's views bound — wrong data, no error
        raise FileNotFoundError(f"scale-factor directory does not exist: {sf_dir}")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
    _registered[key] = sf_dir
