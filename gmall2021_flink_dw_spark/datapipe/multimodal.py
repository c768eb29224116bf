"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for large blobs) with typed
metadata alongside; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time.

The actual codec libraries (PIL/ffmpeg/librosa) are NOT in this image, so
``decode_real`` raises NotImplementedError by design; ``decode_stub`` is
the deterministic fake used by tests/queries — the Spark-side plumbing
(schema, batch iteration, partition behavior) is real and identical to
what a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, payload_len long, content_hash string, "
    "modality string, width int, height int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Ingest: text bytes stand in for a media blob; metadata columns are
    the real pattern (payload + content hash + modality tag)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.md5(F.col("text")).alias("content_hash"),
        F.lit("text-bytes").alias("modality"),
    )


def decode_real(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    """Placeholder for a real media decoder (PIL.Image.open etc.).
    Codec libs are not in this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub for deterministic fake decoding"
    )


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derive (width, height) from payload
    bytes so tests are stable and the full pipeline shape is exercised."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: per Arrow batch, decode payloads vectorized-ish.
    This is the real plumbing a production decoder would drop into."""
    for pdf in batches:
        dims = pdf["payload"].map(decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_len": pdf["payload"].map(len).astype("int64"),
                "content_hash": pdf["content_hash"],
                "modality": pdf["modality"],
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
            }
        )


def decode_features(with_payload: DataFrame) -> DataFrame:
    return with_payload.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
