"""Event-time windowing over the events table.

The reference exposes NO streaming surface (SURVEY.md §2.10 — every
query fully materializes, src/core.rs:119), so parity needs only batch
semantics. These operators give the *batch* event-time windows the
north star asks for, built so the identical aggregation also runs as a
Structured Streaming query (demonstrated by ``streaming_demo`` below
and tests/test_streaming.py):
``F.window``/``F.session_window`` are the same expressions in both
modes; only source/sink and watermark differ.

Scale notes: tumbling/sliding windows shuffle on (window, keys) after
map-side partial aggregation — bytes ∝ distinct windows × keys, not
input rows. Session windows are stateful: batch mode plans a sort
within user partitions; streaming mode keeps per-key state with the
watermark bounding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.queries._util import dsum


def tumbling(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
    )


def sliding(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total_value"))
        .select(F.col("w.start").alias("ws"), "n", "total_value")
    )


def sessionized(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session ends after `gap` of silence.
    window.end in Spark's session_window = last event + gap, hence the
    session_last alias arithmetic in the oracle."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
            "total_value",
        )
    )


def streaming_demo(spark: SparkSession, sf_dir: str, width: str = "1 hour") -> DataFrame:
    """The tumbling aggregation as a real Structured Streaming query:
    parquet readStream → watermark → windowed agg → memory sink,
    driven to completion with processAllAvailable (bounded input).
    Returns the materialized sink contents."""
    import os

    # readStream needs the RAW parquet schema (ts is INT64 nanos under
    # nanosAsLong); sources.catalog.table's µs conversion is re-applied
    # to the stream below
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("path", os.path.join(sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    # nanos→µs conversion mirrors sources.catalog.table for the ns column
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    name = "dfwb_stream_demo"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
