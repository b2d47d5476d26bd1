"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Every path here is REAL byte-level work on codec-free containers: BMP
construct → serialize → parse (header math), numpy nearest-neighbor resize
on decoded pixels, and a raw-frame video container with every-k-th frame
extraction.  Codec-REQUIRING formats (JPEG, audio) are out of scope in
this environment — it ships no codec libraries by design; a real
deployment adds a ``PIL.Image.open`` / ``torchaudio.load`` decode stage
with the same ``mapInPandas`` shape as ``_bmp_decode`` below, changing
nothing structurally (schema, batching, partitioning all carry over).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


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
# fails the hash compare.  (Codec-requiring formats — JPEG/audio — are out
# of scope here; see the module docstring.)
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


# ---------------------------------------------------------------------------
# Resize: REAL pixel math on the decoded BMP (numpy nearest-neighbor), then
# re-encode — the image-preprocessing step of a multimodal training pipeline.
# Verified in tests/test_multimodal_ops.py against an independent per-pixel
# index computation (not by re-running the same numpy ops).
# ---------------------------------------------------------------------------


def _bmp_pixel_array(payload: bytes):
    """Decode BMP pixel data to a (height, width, 3) uint8 array (rows in
    stored bottom-up order — a flip is a view, deterministic either way)."""
    import numpy as np

    meta = _bmp_decode(payload)
    if not meta["decoded_ok"]:
        raise ValueError("not a BMP payload")
    w, h = meta["width"], meta["height"]
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=54)
    return rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)


def _bmp_from_pixels(arr) -> bytes:
    """Re-encode a (h, w, 3) uint8 array as a 24-bpp BMP (rows padded to 4)."""
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = arr.reshape(h, w * 3)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + pixels


def _resize_nearest(arr, tw: int, th: int):
    """Nearest-neighbor resample via integer index maps (floor convention
    src = tgt * src_dim // tgt_dim — same formula the test recomputes)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def bmp_resize(df, target_w: int = 8, target_h: int = 8):
    """(doc_id, payload) → (doc_id, payload) with every BMP resized to
    (target_w, target_h) — decode, numpy nearest-neighbor resample,
    re-encode, all inside one Arrow-batched ``mapInPandas`` stage.

    Scale: narrow (no shuffle), constant memory per batch; on a cluster this
    is the canonical image-normalization map stage before feature
    extraction/training-shard writes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _bmp_from_pixels(
                            _resize_nearest(
                                _bmp_pixel_array(bytes(b)), target_w, target_h
                            )
                        )
                        for b in pdf["payload"]
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# Frame sampling: a minimal raw-frame video container (magic + frame count +
# frame length + concatenated raw RGB frames) — every-k-th frame extraction,
# the video half of the pipeline.  No codec needed: frames are raw bytes, so
# the plumbing (explode-to-frame-rows, per-frame features) is fully real.
# ---------------------------------------------------------------------------

_VID_MAGIC = b"VID0"
_VID_HEADER = 12  # magic + u32 n_frames + u32 frame_len


def _video_encode(doc_id: int, text: bytes) -> bytes:
    """Synthesize a raw-frame video: 1 + doc_id % 8 frames of 4x4 RGB pixels
    cycled from the document bytes at a per-frame offset."""
    import struct

    n_frames = 1 + doc_id % 8
    frame_len = 4 * 4 * 3
    body = bytearray()
    src = text if text else bytes(1)
    for f in range(n_frames):
        body += bytes(src[(f + i) % len(src)] for i in range(frame_len))
    return _VID_MAGIC + struct.pack("<II", n_frames, frame_len) + bytes(body)


def with_video_payload(df):
    """documents → (doc_id, payload binary) raw-frame video containers."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _video_encode(i, t.encode("utf-8"))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return df.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, payload binary"
    )


def sample_frames(df, every_k: int = 2):
    """(doc_id, payload) → (doc_id, frame_idx, checksum): parse the container
    header, slice out every k-th frame, emit one row per sampled frame with
    a byte checksum — frame extraction without materializing unsampled
    frames (the slice never copies them out of the Arrow buffer).

    Scale: narrow map that *grows* rows (frames per video); downstream
    repartition by (doc_id, frame_idx) if a per-frame shuffle follows."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for i, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if len(b) < _VID_HEADER or b[:4] != _VID_MAGIC:
                    continue
                n_frames, frame_len = struct.unpack_from("<II", b, 4)
                for f in range(0, n_frames, every_k):
                    off = _VID_HEADER + f * frame_len
                    frame = b[off : off + frame_len]
                    ids.append(i)
                    idxs.append(f)
                    sums.append(sum(frame) % 2**31)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, checksum long"
    )


# ---------------------------------------------------------------------------
# Registry entry: resize + frame sampling in one row set.  Both checksums are
# deterministic byte math the oracle recomputes INDEPENDENTLY from the
# document text (the same construct→transform→parse trick as the BMP decode
# oracle): a wrong resize index map, header offset, or frame slice on the
# Spark side shifts which source bytes are summed and fails the hash compare.
# documents.text is ASCII in the testdata (asserted cheap via octet_length =
# length in the oracle would be redundant; ascii() = byte value holds).
# ---------------------------------------------------------------------------

RESIZE_W = RESIZE_H = 8
FRAME_EVERY_K = 2


def resize_checksums(df):
    """(doc_id, payload) → (doc_id, width, height, checksum): resize every
    BMP to 8×8 via ``bmp_resize``, then parse the RESIZED container back and
    checksum its pixel bytes — the evidence that real pixel selection
    happened, in one extra Arrow stage (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cks = [], [], []
            for b in pdf["payload"]:
                b = bytes(b)
                meta = _bmp_decode(b)
                ws.append(meta["width"])
                hs.append(meta["height"])
                cks.append(sum(b[54:]) % 2**31)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return bmp_resize(df, RESIZE_W, RESIZE_H).mapInPandas(
        run, schema="doc_id long, width int, height int, checksum long"
    )


@query(
    "multimodal_resize_frames",
    oracle=f"""
    WITH rdim AS (
      SELECT doc_id, text,
             CAST(1 + doc_id % 64 AS BIGINT) AS w,
             CAST(1 + octet_length(encode(text)) % 64 AS BIGINT) AS h,
             (CAST(1 + doc_id % 64 AS BIGINT) * 3 + 3) // 4 * 4 AS row_size,
             CAST(octet_length(encode(text)) AS BIGINT) AS L
      FROM documents),
    rpix AS (
      SELECT d.doc_id,
             CASE WHEN d.L = 0 THEN 0
                  ELSE ascii(substr(d.text,
                    CAST(((ty.i * d.h // {RESIZE_H}) * d.row_size
                          + (tx.i * d.w // {RESIZE_W}) * 3 + c.i) % d.L
                      AS INTEGER) + 1, 1)) END AS byte
      FROM rdim d
      CROSS JOIN (SELECT unnest(range({RESIZE_H})) AS i) ty
      CROSS JOIN (SELECT unnest(range({RESIZE_W})) AS i) tx
      CROSS JOIN (SELECT unnest(range(3)) AS i) c),
    resize_rows AS (
      SELECT doc_id, CAST(SUM(byte) % 2147483648 AS BIGINT) AS checksum
      FROM rpix GROUP BY doc_id),
    vdim AS (
      SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS L,
             1 + doc_id % 8 AS n_frames
      FROM documents),
    sampled AS (
      SELECT doc_id, text, L, f.f AS frame_idx
      FROM vdim CROSS JOIN (SELECT unnest(range(0, 8, {FRAME_EVERY_K})) AS f) f
      WHERE f.f < n_frames),
    fbytes AS (
      SELECT doc_id, frame_idx,
             CASE WHEN L = 0 THEN 0
                  ELSE ascii(substr(text,
                    CAST((frame_idx + i.i) % L AS INTEGER) + 1, 1)) END AS byte
      FROM sampled CROSS JOIN (SELECT unnest(range(48)) AS i) i),
    frame_rows AS (
      SELECT doc_id, frame_idx, CAST(SUM(byte) % 2147483648 AS BIGINT) AS checksum
      FROM fbytes GROUP BY doc_id, frame_idx)
    SELECT 'resize' AS op, doc_id, CAST(0 AS INTEGER) AS idx,
           CAST({RESIZE_W} AS INTEGER) AS width, CAST({RESIZE_H} AS INTEGER) AS height,
           checksum
    FROM resize_rows
    UNION ALL
    SELECT 'frame' AS op, doc_id, CAST(frame_idx AS INTEGER) AS idx,
           CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height, checksum
    FROM frame_rows
    ORDER BY op, doc_id, idx
    """,
)
def multimodal_resize_frames(spark, sf_dir):
    """Image resize + video frame sampling, driver-checked in one union:

    - ``resize`` rows: synthesize a BMP per document, nearest-neighbor
      resample to {w}×{h} with real numpy index maps, re-encode, parse the
      resized container back, checksum its pixel bytes.
    - ``frame`` rows: synthesize a raw-frame video container, slice out
      every {k}-th frame, checksum each sampled frame's bytes.

    The oracle recomputes both checksums from the document text with
    independent index arithmetic (resize: src = tgt·dim // target; frames:
    byte i of frame f = text[(f+i) mod len])."""
    d = load_table(spark, sf_dir, "documents")
    rs = resize_checksums(with_bmp_payload(d)).select(
        F.lit("resize").alias("op"),
        "doc_id",
        F.lit(0).alias("idx"),
        "width",
        "height",
        "checksum",
    )
    fr = sample_frames(with_video_payload(d), FRAME_EVERY_K).select(
        F.lit("frame").alias("op"),
        "doc_id",
        F.col("frame_idx").alias("idx"),
        F.lit(4).alias("width"),
        F.lit(4).alias("height"),
        "checksum",
    )
    return rs.unionAll(fr).orderBy("op", "doc_id", "idx")


multimodal_resize_frames.__doc__ = multimodal_resize_frames.__doc__ and multimodal_resize_frames.__doc__.format(w=RESIZE_W, h=RESIZE_H, k=FRAME_EVERY_K)



# ---------------------------------------------------------------------------
# Audio: WAV/PCM (RIFF) — codec-free like BMP, so the decode is REAL byte
# work: canonical 44-byte header construction, chunk-walk parsing, and
# numpy feature extraction over the raw 16-bit samples.  A real deployment
# swaps the synthesis for torchaudio/soundfile loads with the same
# mapInPandas shape; compressed codecs (MP3/AAC) stay out of scope in this
# container for the same reason as JPEG.
# ---------------------------------------------------------------------------

_WAV_RATES = (8000, 16000, 44100)


def _wav_rate(doc_id: int) -> int:
    return _WAV_RATES[doc_id % len(_WAV_RATES)]


def _wav_encode(doc_id: int, text: bytes) -> bytes:
    """Build a valid PCM WAV: RIFF header + ``fmt `` chunk (16-bit mono,
    rate cycled per doc) + ``data`` chunk of samples derived from the
    document's own bytes (``(b - 128) << 8`` — full-scale, deterministic)."""
    import struct

    import numpy as np

    rate = _wav_rate(doc_id)
    src = np.frombuffer(text if text else b"\x80", dtype=np.uint8)
    pcm = ((src.astype(np.int16) - 128) << 8).astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    data_hdr = struct.pack("<4sI", b"data", len(pcm))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(pcm), b"WAVE")
    return riff + fmt + data_hdr + pcm


def with_wav_payload(df):
    """documents → (doc_id, payload binary): synthesizes real WAV containers
    (Arrow-batched, constant memory per task) — the audio twin of
    ``with_bmp_payload``."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _wav_encode(i, t.encode("utf-8"))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return df.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, payload binary"
    )


def _wav_decode(payload: bytes) -> dict:
    """Parse the RIFF container by WALKING chunks (not fixed offsets — real
    WAV files carry LIST/INFO chunks before ``data``), extracting the fmt
    fields and locating the sample bytes."""
    import struct

    bad = {
        "sample_rate": 0, "n_channels": 0, "bits": 0,
        "n_samples": 0, "duration_ms": 0.0, "decoded_ok": False,
        "_data": (0, 0),
    }
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return bad
    pos, rate, channels, bits, data_off, data_len = 12, 0, 0, 0, 0, 0
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt " and clen >= 16 and body + 16 <= len(payload):
            _, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
        elif cid == b"data":
            data_off, data_len = body, min(clen, len(payload) - body)
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if not (rate and channels and bits and data_len):
        return bad
    n_samples = data_len // (bits // 8) // channels
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples / rate * 1000.0,
        "decoded_ok": True,
        "_data": (data_off, data_len),
    }


def wav_features(df):
    """(doc_id, payload) → per-clip audio features: container metadata from
    the chunk-walk plus REAL signal statistics over the raw 16-bit samples
    (numpy RMS and peak — the normalization/clipping statistics an audio
    training pipeline computes at ingest).  Arrow-batched ``mapInPandas``;
    payloads never leave the executor; malformed containers yield a
    ``decoded_ok=false`` row instead of failing the task."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(b)
                m = _wav_decode(p)
                off, ln = m.pop("_data")
                if m["decoded_ok"] and m["bits"] == 16 and ln >= 2:
                    s = np.frombuffer(p, dtype="<i2", count=ln // 2, offset=off)
                    rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
                    peak = int(np.max(np.abs(s.astype(np.int32))))
                else:
                    rms, peak = 0.0, 0
                rows.append({"doc_id": doc_id, **m, "rms": rms, "peak": peak})
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        feats,
        schema=(
            "doc_id long, sample_rate int, n_channels int, bits int,"
            " n_samples long, duration_ms double, decoded_ok boolean,"
            " rms double, peak int"
        ),
    )
