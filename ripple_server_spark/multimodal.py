"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) ride through the engine as ``binary`` columns
with typed metadata structs — the 100 TB pattern: bytes stay columnar
(parquet keeps them compressed, scans prune them unless projected), and
decode/feature-extract runs as Arrow-batched ``mapInPandas`` so Python
touches each batch once.

The container has no media libraries, so the actual decoders are
STUBBED (clearly marked below): `fake=True` (default) derives
deterministic pseudo-metadata from the payload's md5 — making the
Spark-side plumbing (schema, batching, partitioning, UDF signatures)
fully real and testable — while `fake=False` raises NotImplementedError
exactly where a real Pillow/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, "
    "width long, height long, n_channels long"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as (id, payload binary, metadata): the ingest
    shape for media. Here payload = utf-8 bytes of `text` (the fixtures
    carry no real media); for real media this is the file's bytes."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic pseudo image dims from md5 bytes.
    Replace with PIL.Image.open(...) in a real deployment."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0], 64 + h[1], 1 + (h[2] % 3)


def decode_batch(pdf_iter: Iterator[pd.DataFrame], fake: bool = True) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one metadata frame out.

    Generator form means constant memory per task regardless of
    partition size — the shape that survives 100 TB inputs.
    """
    for pdf in pdf_iter:
        if not fake:
            # Real decode would go here (PIL / torchaudio / pyav).
            raise NotImplementedError("media codecs not available in this environment")
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            w, h, c = _fake_decode(b)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(b),
                    "checksum": hashlib.md5(b).hexdigest(),
                    "width": w,
                    "height": h,
                    "n_channels": c,
                }
            )
        yield pd.DataFrame(rows, columns=[
            "doc_id", "n_bytes", "checksum", "width", "height", "n_channels"
        ])


def decode_documents(docs: DataFrame) -> DataFrame:
    """Full pipeline: binary ingest -> Arrow-batched decode -> typed
    metadata DataFrame. Partitioning is preserved (no shuffle: decode is
    a map-side transform)."""
    return attach_binary_payload(docs).select("doc_id", "payload").mapInPandas(
        decode_batch, schema=DECODE_SCHEMA
    )
