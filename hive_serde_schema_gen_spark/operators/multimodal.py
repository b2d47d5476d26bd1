"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a STUB
(deterministic fake features clearly marked as such) — but everything
Spark-side is real and tested: binary column construction, the
``mapInPandas`` batch iterator contract, explicit output schemas, and
partition-friendly shapes.  Swapping ``_fake_decode`` for a real
``PIL.Image.open``/``torchaudio.load`` changes nothing structurally.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

DECODE_AVAILABLE = False  # no codec libs in this environment (by design)


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder: deterministic pseudo-features from the payload bytes.

    Stands in for image decode / resize / frame sampling.  Raising path for
    a real deployment is kept explicit so callers can't mistake fake
    features for real ones.
    """
    if DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in this environment")
    checksum = sum(payload[:64]) if payload else 0
    return {
        "width": 16 + checksum % 64,
        "height": 16 + (checksum // 64) % 64,
        "n_frames": 1,
    }


def with_payload(df):
    """documents → (doc_id, payload binary): the binary-column construction
    step a real pipeline does at ingest (here from text, as the container
    has no media files)."""
    return df.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))


@query(
    "multimodal_payload_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN octet_length(encode(text)) = 0 THEN ''
                ELSE upper(substr(hex(encode(text)), 1, 2)) END AS first_byte_hex
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_payload_meta(spark, sf_dir):
    """Typed metadata extraction from a binary column via ``mapInPandas`` —
    the decode-free half of the multimodal path (byte length + magic byte),
    oracle-checkable because it never leaves the payload's byte content.

    Scale: mapInPandas streams Arrow batches — constant memory per task,
    no row-at-a-time serde."""
    d = load_table(spark, sf_dir, "documents")

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # hex of the raw first BYTE (not code point) — byte-true,
                    # so the oracle comparison holds for any encoding
                    "first_byte_hex": payloads.map(
                        lambda b: f"{b[0]:02X}" if len(b) else ""
                    ),
                }
            )

    return (
        with_payload(d)
        .mapInPandas(meta, schema="doc_id long, n_bytes long, first_byte_hex string")
        .orderBy("doc_id")
    )


@query("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark, sf_dir):
    """Decode + feature-extract over binary payloads (STUBBED decode — see
    ``_fake_decode``).  Demonstrates the real plumbing: binary in, struct of
    typed features out, explicit schema, batch-shaped UDF.  No oracle (the
    fake features are engine-internal by definition); the driver records a
    rows-only check."""
    d = load_table(spark, sf_dir, "documents")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "decoded_ok": [True] * len(feats),
                }
            )

    return (
        with_payload(d)
        .mapInPandas(
            decode,
            schema="doc_id long, width int, height int, n_frames int, decoded_ok boolean",
        )
        .orderBy("doc_id")
    )
