"""Structured Streaming demo: the batch tumbling aggregation run as a
real streaming query (parquet readStream → watermark → window →
memory sink) must produce exactly the batch result."""

from __future__ import annotations

from datafusion_wasm_bindings_spark.sources.catalog import table
from datafusion_wasm_bindings_spark.streaming.events import streaming_demo, tumbling


def test_streaming_matches_batch(spark, sf_dir):
    stream_out = {
        (r.ws, r.event_type): r.n for r in streaming_demo(spark, sf_dir).collect()
    }
    batch_out = {
        (r.ws, r.event_type): r.n
        for r in tumbling(table(spark, sf_dir, "events")).collect()
    }
    assert stream_out == batch_out
    assert len(batch_out) > 0
