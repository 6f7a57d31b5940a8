"""Token-budget sequence packing for LLM pretraining datasets.

The standard packed-pretraining construction ("concat and chunk"):
documents are concatenated in a deterministic order into one token
stream per shard, and the stream is cut every ``budget`` tokens into
fixed-length training sequences. A document belongs to the sequence
where it *starts*; documents that cross a cut boundary are the ones a
loader would split across sequences (reported per sequence so the
pipeline can measure fragmentation and choose budget/shard counts).

This variant is chosen over greedy next-fit bin packing deliberately:
next-fit needs a running *reset* state (bin fill) that neither plain
window functions nor a fixed-depth fold can express, while
concat-and-chunk is a pure prefix-sum — one window cumsum — so it is
bit-deterministic, SQL-oracle-able, and embarrassingly parallel.

Scale posture (100 TB): the only wide exchange is the hash partition
on ``shard``; within a shard the cumsum is a single sorted window scan.
Shard count is the parallelism knob — size it so one shard's documents
fit a task (e.g. 100k shards over 100 TB ≈ 1 GB/shard); packing
quality is unaffected because sequences never span shards by design
(matching how real loaders shard corpora). Sharding here is
``doc_id % n_shards`` to keep the oracle engine-portable; a production
run would use a uniform hash the same way.

No reference analogue — north-star extension (SURVEY.md §7.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.operators.text import tokens_col


def pack_sequences(
    documents: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, seq_id) under concat-and-chunk
    packing and roll up per-sequence stats.

    Returns one row per training sequence: ``shard``, ``seq_id``,
    ``n_docs`` (documents starting in the sequence), ``start_tokens``
    (their summed token counts), ``n_split`` (how many of them cross
    the sequence's right boundary and would be split by a loader).
    """
    toks = F.size(tokens_col())
    docs = documents.select(
        "doc_id",
        (F.col("doc_id") % F.lit(n_shards)).alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = docs.select(
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
        F.sum("n_tokens").over(w).alias("end_off"),
    ).select(
        "shard",
        "n_tokens",
        F.floor(F.col("start_off") / budget).cast("long").alias("seq_id"),
        # a doc crosses the cut iff its last token lands in a later
        # chunk than its first (empty docs never cross)
        (
            (F.col("n_tokens") > 0)
            & (
                F.floor((F.col("end_off") - 1) / budget)
                > F.floor(F.col("start_off") / budget)
            )
        ).alias("crosses"),
    )
    return (
        placed.groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("start_tokens"),
            F.sum(F.col("crosses").cast("long")).alias("n_split"),
        )
        .orderBy("shard", "seq_id")
    )
