"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. Real codecs are not available in this container, so the
DECODE step is stubbed (deterministic fake, clearly marked) while the
Spark-side plumbing — schema, partition-friendly layout, mapInPandas
batch shape, Arrow transfer — is real and tested. Swapping the stub for
PIL/ffmpeg later changes only ``_fake_decode``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "doc_id long, n_bytes int, media_type string, width int, height int, "
    "n_frames int, sample_rate int"
)

DECODE_IS_STUB = True


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture path: synthesize a binary payload column (utf-8 bytes
    of the text) + declared media type. Real pipelines read the bytes from
    object storage instead."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, int]:
    """STUB decoder (no codec libs in sandbox): deterministic pseudo-
    metadata from the byte length. Replace with PIL/soundfile/ffmpeg —
    signature stays (bytes, type) -> (width, height, n_frames, rate)."""
    n = len(payload)
    if media_type == "image":
        return (n % 640 + 1, (n * 7) % 480 + 1, 1, 0)
    if media_type == "audio":
        return (0, 0, 0, 8000 + n % 40000)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 300 + 1, 0)


def decode_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: decode payloads -> typed metadata.
    This is the real plumbing for a decode/feature-extract stage: batched
    binary in, columnar struct out, no row-at-a-time Python in Spark's
    serialization path (the stub itself is per-payload, as any codec is)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode(bytes(p) if p is not None else b"", mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            m = np.array(metas, dtype=np.int64).reshape(len(pdf), 4)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "media_type": pdf["media_type"],
                    "width": m[:, 0],
                    "height": m[:, 1],
                    "n_frames": m[:, 2],
                    "sample_rate": m[:, 3],
                }
            )

    return media.mapInPandas(fn, schema=MEDIA_META_DDL)


def frame_sample_plan(media_meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (posexplode of a sequence) — the shuffle-free fan-out a
    real frame extractor would map over."""
    vids = media_meta.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
