"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this
environment, so the *decode* step is a clearly-marked stub — but the
Spark-side plumbing is real and tested: binary columns, Arrow batch
transfer, mapInPandas signatures, metadata schema, partitioning. A real
pipeline swaps ``_fake_decode`` for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_DDL = "doc_id bigint, n_bytes bigint, payload_sha string, modality string"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque binary column (here: utf-8 bytes of the text —
    deterministic stand-in for an image/audio blob)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _fake_decode(payload: bytes) -> dict:
    """STUB: deterministic fake 'decode'. A real implementation would
    parse the container format (e.g. PIL.Image.open) — unavailable here.
    """
    return {
        "n_bytes": len(payload),
        "payload_sha": hashlib.sha256(payload).hexdigest(),
        "modality": "text",
    }


def decode_image(payload: bytes):
    """Real-decoder placeholder. Raises until an image lib is present."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this environment"
    )


def extract_metadata(with_payload: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: binary in, typed metadata out.
    The batch shape (vectorized columns, one yield per Arrow batch) is
    the production shape; only the per-payload decode body is stubbed."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"].values]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return with_payload.select("doc_id", "payload").mapInPandas(_extract, META_DDL)
