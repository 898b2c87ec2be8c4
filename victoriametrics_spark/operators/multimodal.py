"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

The decode step is STUBBED (no image/audio libs in this container): a
clearly-marked deterministic fake keyed on the content hash stands in for
pixel decoding. Everything around it — schema, batching, partitioning,
UDF signature — is real and tested, so swapping in a real decoder is a
one-function change.

Scale shape: mapInPandas streams Arrow batches through Python once;
metadata extraction stays JVM-side so pruning/filtering on metadata never
pays the Python boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),  # e.g. png, wav, mp4
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        # stubbed decode outputs (deterministic fake):
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def extract_metadata(df: DataFrame) -> DataFrame:
    """JVM-side metadata: byte length + sha2 — no Python boundary, so
    filters on these prune before any decode."""
    return df.select(
        "media_id",
        "kind",
        "format",
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """STUB: deterministic fake decoder (container lacks image/audio libs).

    Real implementation would go through PIL/libav here. The fake derives
    stable pseudo-dimensions from the content hash so tests are exact.
    """
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 32
    return width, height, n_frames


def decode_media(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched decode via mapInPandas (the real 100 TB shape: one
    pass, per-partition batch iterator, bounded memory per batch)."""

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # vectorized over the Arrow batch: one pass of pandas `map`
            # per derived column, no per-row iterrows loop. A real decoder
            # would replace the digest maps with the PIL/libav call — the
            # batch shape stays identical.
            content = pdf["content"].map(
                lambda c: bytes(c) if c is not None else b""
            )
            digests = content.map(lambda c: hashlib.sha256(c).digest())
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha": digests.map(bytes.hex),
                    "width": digests.map(lambda d: 64 + d[0] % 192).astype(
                        "int32"
                    ),
                    "height": digests.map(lambda d: 64 + d[1] % 192).astype(
                        "int32"
                    ),
                    "n_frames": digests.map(lambda d: 1 + d[2] % 32)
                    .where(pdf["kind"] == "video", 1)
                    .astype("int32"),
                }
            )
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Plan frame sampling for videos: one output row per sampled frame
    index — pure JVM explode, decode happens downstream per-frame."""
    decoded = decode_media(df)
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
    )
