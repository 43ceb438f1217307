"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, Arrow binary batching through
``mapInPandas``, partition-friendly fan-out — is real and tested. The
actual codec step is STUBBED (``decode_media(..., codec='real')``
raises NotImplementedError: no image/audio libraries in this
container); the default 'fake' codec is a deterministic
hash-derived decoder so downstream feature plumbing is exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["media_table_from_docs", "decode_media", "media_features"]

MEDIA_SCHEMA = (
    "media_ref string, kind string, data binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

DECODED_SCHEMA = "media_ref string, width int, height int, n_frames int, features array<float>"


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Derive an opaque media table from the corpus' media spans:
    (media_ref, kind, data binary, meta). Bytes are deterministic
    (hash of the ref) — a stand-in for reading object storage."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                h = hashlib.blake2b(ref.encode(), digest_size=32).digest()
                kind = ["image", "audio", "video"][h[0] % 3]
                data = (h * 8)[:256]
                meta = (
                    64 + h[1] % 64,
                    64 + h[2] % 64,
                    1 + h[3] % 30 if kind == "video" else 1,
                    16000 if kind == "audio" else 0,
                )
                rows.append((ref, kind, bytearray(data), meta))
            yield pd.DataFrame(
                rows, columns=["media_ref", "kind", "data", "meta"]
            )

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_media(media: DataFrame, codec: str = "fake", dim: int = 8) -> DataFrame:
    """Decode + feature-extract each media blob via Arrow-batched
    mapInPandas. ``codec='real'`` is the integration point for actual
    image/audio decoders (PIL/torchaudio/ffmpeg) — not available in
    this container, so it raises; 'fake' derives deterministic
    features from the bytes, keeping schema/batching/partitioning
    identical to the real path."""
    if codec == "real":
        raise NotImplementedError(
            "real codecs unavailable in this environment; plug a decoder "
            "into _decode_batch and pass codec='real'"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data, meta in zip(pdf["media_ref"], pdf["data"], pdf["meta"]):
                h = hashlib.blake2b(bytes(data), digest_size=4 * dim).digest()
                feats = (
                    np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                    / np.float32(2**32)
                ).tolist()
                rows.append(
                    (ref, meta["width"], meta["height"], meta["n_frames"], feats)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height", "n_frames", "features"],
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def media_features(docs: DataFrame, dim: int = 8) -> DataFrame:
    """End-to-end plumbing: docs -> media table -> decoded features,
    joined back to (doc_id, media_ref, features)."""
    media = media_table_from_docs(docs)
    feats = decode_media(media, codec="fake", dim=dim)
    doc_refs = (
        docs.select(F.col("doc_id"), F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    return doc_refs.join(feats, on="media_ref").select(
        "doc_id", "media_ref", "width", "height", "n_frames", "features"
    )
