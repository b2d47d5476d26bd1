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


# ---------------------------------------------------------------------------
# Real container decode: BMP (plain struct math — no codec library needed).
# The ingest side synthesizes a valid 24-bpp BMP per document (dimensions
# derived deterministically from the row, pixels from the text bytes); the
# decode side parses the actual container header back out of the bytes.
# The DuckDB oracle recomputes the expected dimensions from the same row
# data, so a wrong header layout, offset, or endianness on either side
# fails the hash compare.  Codec-requiring modalities (JPEG/audio/video)
# remain stubbed via ``_fake_decode`` above.
# ---------------------------------------------------------------------------


def _bmp_dims(doc_id: int, text_len: int):
    return 1 + doc_id % 64, 1 + text_len % 64


def _bmp_encode(doc_id: int, text: bytes) -> bytes:
    """Build a valid BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
    bottom-up 24-bpp pixel rows padded to 4 bytes, pixels cycled from the
    document's own bytes."""
    import struct

    width, height = _bmp_dims(doc_id, len(text))
    row_size = (width * 3 + 3) // 4 * 4
    img_size = row_size * height
    pixels = (
        (text * (img_size // len(text) + 1))[:img_size] if text else bytes(img_size)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + pixels


def with_bmp_payload(df):
    """documents → (doc_id, text, payload binary): the ingest step that in a
    real pipeline reads image files; here it synthesizes real BMP containers
    (Arrow-batched, constant memory per task)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _bmp_encode(i, t.encode("utf-8"))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return df.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, payload binary"
    )


def _bmp_decode(payload: bytes) -> dict:
    """Parse the BMP container header — a REAL byte-level decode (magic
    check, little-endian field extraction at the documented offsets)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return {"width": 0, "height": 0, "bpp": 0, "img_bytes": 0, "decoded_ok": False}
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    img_bytes = struct.unpack_from("<I", payload, 34)[0]
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "img_bytes": img_bytes,
        "decoded_ok": True,
    }


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 64 AS INTEGER)                 AS width,
           CAST(1 + octet_length(encode(text)) % 64 AS INTEGER) AS height,
           CAST(24 AS INTEGER)                              AS bpp,
           CAST(((1 + doc_id % 64) * 3 + 3) // 4 * 4
                * (1 + octet_length(encode(text)) % 64) AS INTEGER) AS img_bytes,
           TRUE AS decoded_ok
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_decode_features(spark, sf_dir):
    """Decode + feature-extract over binary payloads: synthesize a real BMP
    container per document, then parse width/height/bpp/size back out of the
    raw bytes (``_bmp_decode`` — struct math on the actual header).  The
    oracle recomputes the dimensions from the row data, closing the
    construct→serialize→parse loop byte-for-byte.

    Scale: two Arrow-batched ``mapInPandas`` stages, no shuffle between them
    (same partitioning); payloads never leave the executor."""
    d = load_table(spark, sf_dir, "documents")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_bmp_decode(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "bpp": [f["bpp"] for f in feats],
                    "img_bytes": [f["img_bytes"] for f in feats],
                    "decoded_ok": [f["decoded_ok"] for f in feats],
                }
            )

    return (
        with_bmp_payload(d)
        .mapInPandas(
            decode,
            schema="doc_id long, width int, height int, bpp int, img_bytes int, decoded_ok boolean",
        )
        .orderBy("doc_id")
    )
