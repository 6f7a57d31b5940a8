"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star pattern (BASELINE.json): image/audio/video travel as
``binary`` columns beside a struct of metadata; decode / feature
extraction runs as Arrow-batched pandas functions over mapInPandas.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake keyed off the payload bytes (clearly marked below);
everything around it — schema, batch iteration, partitioning, UDF
signatures — is the real production plumbing and is tested/oracle-
checked numerically.

Scale notes: mapInPandas streams Arrow batches (~10k rows) per
partition — memory is bounded by batch size × payload size, not
partition size; decode parallelism = task parallelism. Binary payloads
never pass through a shuffle here (metadata-only results leave the
UDF), which is the rule to keep at 100 TB: shuffle features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media binary, meta struct<format:string, declared_len:bigint>"
FEATURE_SCHEMA = "doc_id long, format string, n_bytes long, width int, height int, checksum long"


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: the UTF-8
    text bytes stand in for an encoded media payload.

    The SYNTHESIZER (not the pipeline) maps non-ASCII codepoints to
    '?': the byte-offset operations downstream (head-128 checksum,
    stride decimation, 100-byte frame slices) are real media-byte
    plumbing, and on multi-byte text they'd slice mid-codepoint — an
    Arrow UTF-8 error when a frame is re-read as text, and a CHAR≠BYTE
    break for the SQL oracles (adversarial extremes replay, r6). Real
    payload bytes come from files, never from text, so the stub
    generating clean single-byte payloads loses nothing. Java regex
    and RE2 both match character classes per CODEPOINT (an emoji is
    one '?', not two surrogate '??'), so both engines sanitize
    identically."""
    return documents.select(
        "doc_id",
        F.encode(
            F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", "?"), "UTF-8"
        ).alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, F.lit("png")).otherwise(F.lit("jpeg")).alias("format"),
            F.col("n_chars").alias("declared_len"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The worker function is a fully self-contained closure: executors
    deserialize it by value, so it runs even when the package is not
    importable on the Python workers (the driver harness invokes us
    from an arbitrary cwd with sys.path patched only in its driver
    process).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            # STUB decoder — deterministic stand-in for PIL/ffmpeg,
            # which are not in this container. A real deployment
            # replaces this body with e.g.
            # ``PIL.Image.open(io.BytesIO(payload)).size``; the
            # signature and batch plumbing stay identical.
            n = len(payload)
            width = 64 + (n % 577)
            height = 64 + ((n * 31) % 479)
            checksum = 0
            for b in payload[:128]:
                checksum = (checksum * 131 + b) % 1_000_000_007
            return width, height, checksum

        for pdf in it:
            # NULL payloads are routine at scale (failed fetches,
            # redacted rows): decode skips them and every feature
            # surfaces NULL — the row itself is kept. Nullable ints go
            # through pandas' Int64 extension dtype so Arrow hands
            # Spark real NULLs, not NaN-poisoned floats.
            medias = [None if m is None else bytes(m) for m in pdf["media"]]
            dims = [None if m is None else fake_decode(m) for m in medias]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [
                        None if m is None else m["format"] for m in pdf["meta"]
                    ],
                    "n_bytes": pd.array(
                        [None if m is None else len(m) for m in medias],
                        dtype="Int64",
                    ),
                    "width": pd.array(
                        [None if d is None else d[0] for d in dims], dtype="Int64"
                    ),
                    "height": pd.array(
                        [None if d is None else d[1] for d in dims], dtype="Int64"
                    ),
                    "checksum": pd.array(
                        [None if d is None else d[2] for d in dims], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, scale_denominator: int = 4) -> DataFrame:
    """'Resize' via mapInPandas: decimate the payload to every k-th
    byte and re-emit BINARY + updated metadata — the real pipeline
    shape, where resized media continues downstream (into
    ``extract_features``, storage, or a model input writer).

    The decimation is the STUB for an actual decode→scale→re-encode
    (PIL/ffmpeg are not in this container); the production swap-in
    changes only the ``fake_resize`` body. Payload stays columnar Arrow
    end-to-end and is never shuffled (map-only plan).
    """
    k = int(scale_denominator)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_resize(payload: bytes) -> bytes:
            # STUB resizer — deterministic stand-in for a real
            # decode→scale→re-encode; keeps every k-th byte
            return payload[::k]

        for pdf in it:
            # NULL payload -> NULL resized payload + NULL meta (row
            # kept); see extract_features' NULL note
            resized = [
                None if m is None else fake_resize(bytes(m)) for m in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": resized,
                    "meta": [
                        None
                        if m is None
                        else {
                            "format": m["format"],
                            "declared_len": None if r is None else len(r),
                        }
                        for m, r in zip(pdf["meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload at a fixed stride,
    emitting one row per sample — the explode-shaped pattern a video
    pipeline uses for frames. Pure built-in functions (substring on
    binary), no Python."""
    n_frames = F.greatest((F.length("media") / every_n_bytes).cast("int"), F.lit(1))
    return media.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(F.col("media"), i * every_n_bytes + 1, 16),
            )
        ).alias("frame_no", "frame_bytes"),
    )
