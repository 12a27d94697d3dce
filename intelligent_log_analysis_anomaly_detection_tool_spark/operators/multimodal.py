"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

Real image/audio decode libraries are not available in this container, so the
DECODE KERNEL IS A CLEARLY-MARKED STUB (deterministic fake features derived
from the raw bytes; ``strict=True`` raises NotImplementedError instead). What
IS real and tested is everything Spark-side: the binary schema, the batch
iterator shape, partition sizing, and the UDF signatures — swapping the stub
for PIL/ffmpeg is a kernel-only change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_bytes:long>"
)

FEATURE_DIM = 8


def attach_fake_media(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Wrap each document's bytes as an opaque media payload with typed
    metadata — the canonical multimodal table shape (binary + struct meta)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(payload)
    media_type = F.when(F.col(id_col) % 3 == 0, "image/png").when(
        F.col(id_col) % 3 == 1, "audio/wav"
    ).otherwise("video/mp4")
    meta = F.struct(
        F.when(media_type.startswith("image"), (F.col(id_col) % 64 + 1) * 16)
        .otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(media_type.startswith("image"), (F.col(id_col) % 48 + 1) * 16)
        .otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(media_type.startswith("audio"), F.lit(16000))
        .otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        n_bytes.cast("long").alias("n_bytes"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media_type.alias("media_type"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decode kernel: deterministic 8-dim feature from byte statistics.
    A real kernel would decode the image/audio here (PIL / soundfile /
    ffmpeg) and produce embeddings; not available in this environment."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([float(c.mean()) if c.size else 0.0 for c in chunks])


def extract_features(media: DataFrame, strict: bool = False,
                     batch_limit: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).

    ``strict=True`` models the real-library path and raises
    NotImplementedError (no decoders in this container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decode requires PIL/soundfile/ffmpeg; "
                "not available in this environment"
            )
        for pdf in batches:
            # bound per-yield batch size: decoded media blows up memory fast
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo : lo + batch_limit]
                feats = [
                    _fake_decode(p).round(4).tolist() for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].to_numpy(),
                        "media_type": chunk["media_type"].to_numpy(),
                        "n_bytes": [len(p) for p in chunk["payload"]],
                        "features": feats,
                    }
                )

    return media.mapInPandas(
        kernel,
        schema="doc_id long, media_type string, n_bytes long, features array<double>",
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN (indices only — decode is the stub above):
    emits (doc_id, frame_idx) rows for every n-th fake frame. Shows the
    explode-shaped plumbing a real frame sampler uses."""
    n_frames = (F.col("meta.n_bytes") / 16).cast("int")
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.filter(F.col("media_type") == "video/mp4").select(
        "doc_id", F.explode(idxs).alias("frame_idx")
    )
