"""Round-17 vectorization parity: the batched numpy paths inside
`image_hashes`, `audio_fingerprints`, `video_fingerprints`, and
`_video_payloads_batch` must be bit-identical to the scalar references
(`_dhash`/`_ahash`, `_audio_fp`, `_frame_dhash_u` + majority pool,
`_video_encode`/`_video_redub`) they replaced — on the evidence corpus
shapes AND the edge payloads (empty text, multi-channel, odd data
length, malformed containers interleaved with good ones)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_serde_schema_gen_spark.operators.media_audio import (
    _audio_fp,
    _wav_container,
    _wav_encode,
    _wav_pcm_samples,
    audio_fingerprints,
)
from hive_serde_schema_gen_spark.operators.media_core import (
    _bmp_encode,
    _bmp_from_pixels,
    _bmp_pixel_array,
    _pack_bits_signed64,
    _resize_nearest,
)
from hive_serde_schema_gen_spark.operators.media_image import (
    _ahash,
    _dhash,
    _image_hashes_batch,
    _pack_u64_rows,
    image_hashes,
)
from hive_serde_schema_gen_spark.operators.media_video import (
    _VID_HEADER,
    _VID_MAGIC,
    _frame_dhash_u,
    _video_encode,
    _video_payloads_batch,
    _video_redub,
    video_fingerprints,
)

TEXTS = [
    b"the quick brown fox jumps over the lazy dog",
    b"a",
    b"",
    b"\x00\x01\x02\xff\xfe" * 40,
    b"repetition repetition repetition",
    bytes(range(256)),
    "café 中文 text".encode("utf-8"),
]


def _rows(n=40):
    """(doc_id, text) rows covering every dims/rate/frame-count residue."""
    out = []
    for d in range(n):
        out.append((d, TEXTS[d % len(TEXTS)]))
    # giant ids exercise the 64-wide dims wrap
    out.append((10_000_000, TEXTS[0]))
    return out


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------


def test_pack_u64_rows_matches_scalar():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(50, 64)).astype(bool)
    bits[0, :] = True   # all-ones: the full two's-complement wrap (-1)
    bits[1, :] = False  # all-zeros
    bits[2, :] = False
    bits[2, 63] = True  # sign bit only: int64 min
    packed = _pack_u64_rows(bits)
    assert packed.dtype == np.int64
    for row, got in zip(bits, packed):
        assert int(got) == _pack_bits_signed64(row)


# ---------------------------------------------------------------------------
# image: _image_hashes_batch vs _dhash/_ahash, operator end-to-end
# ---------------------------------------------------------------------------


def _image_payloads():
    pays = []
    for d, t in _rows():
        base = _bmp_encode(d, t)
        pays.append(base)
        if d % 4 == 0:  # 2x nearest upscale (the planted variant shape)
            arr = _bmp_pixel_array(base)
            h, w = arr.shape[:2]
            pays.append(_bmp_from_pixels(_resize_nearest(arr, 2 * w, 2 * h)))
    return pays


def test_image_hashes_batch_matches_scalar():
    pays = _image_payloads()
    n = len(pays)
    starts = np.zeros(n, dtype=np.int64)
    Ws = np.zeros(n, dtype=np.int64)
    Hs = np.zeros(n, dtype=np.int64)
    fast = np.zeros(n, dtype=bool)
    pos = 0
    for j, p in enumerate(pays):
        starts[j] = pos
        pos += len(p)
        w, h = struct.unpack_from("<ii", p, 18)
        Ws[j], Hs[j], fast[j] = w, h, True
    buf = np.frombuffer(b"".join(pays), dtype=np.uint8)
    dh, ah = _image_hashes_batch(fast, Ws, Hs, starts, buf)
    assert dh.shape == (n,)
    for j, p in enumerate(pays):
        arr = _bmp_pixel_array(p)
        assert int(dh[j]) == _dhash(arr), f"dhash mismatch row {j}"
        assert int(ah[j]) == _ahash(arr), f"ahash mismatch row {j}"


def test_image_hashes_operator_with_malformed_rows(spark):
    """The operator's vectorized fast path + scalar fallback must produce
    exactly the scalar result set: bad payloads dropped, good ones hashed."""
    pays = _image_payloads()
    rows = [(i, bytearray(p)) for i, p in enumerate(pays)]
    # malformed members interleaved: truncated header, wrong magic,
    # truncated pixel buffer
    rows.append((900, bytearray(b"BM\x00")))
    rows.append((901, bytearray(b"XXinvalid" + bytes(60))))
    rows.append((902, bytearray(pays[0][: len(pays[0]) - 5])))
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    got = {
        r["img_id"]: (r["width"], r["height"], r["dhash"], r["ahash"])
        for r in image_hashes(df).collect()
    }
    assert set(got) == set(range(len(pays)))  # bad ids dropped
    for i, p in enumerate(pays):
        arr = _bmp_pixel_array(p)
        h, w = arr.shape[:2]
        assert got[i] == (w, h, _dhash(arr), _ahash(arr))
    with pytest.raises(Exception):
        image_hashes(df, on_error="raise").collect()


# ---------------------------------------------------------------------------
# audio: vectorized anchor gather vs _audio_fp (incl. stereo + odd lengths)
# ---------------------------------------------------------------------------


def _stereo_wav(rate: int, left: np.ndarray, right: np.ndarray) -> bytes:
    inter = np.empty(2 * left.size, dtype="<i2")
    inter[0::2] = left
    inter[1::2] = right
    pcm = inter.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 2, 2, rate, rate * 4, 4, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(pcm))
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(pcm), b"WAVE"
    )
    return riff + fmt + data_hdr + pcm


def _expected_afp(payload: bytes) -> int:
    """Scalar reference: the exact pre-vectorization per-row code path."""
    from hive_serde_schema_gen_spark.operators.media_audio import _wav_decode

    m = _wav_decode(payload)
    off, ln = m.pop("_data")
    assert m["decoded_ok"] and m["bits"] == 16 and ln >= 2
    s = np.frombuffer(payload, dtype="<i2", count=ln // 2, offset=off)
    if m["n_channels"] > 1:
        s = s[:: m["n_channels"]]
    return _audio_fp(s)


def test_audio_fingerprints_vectorized_matches_scalar(spark):
    rng = np.random.default_rng(11)
    pays = []
    for d, t in _rows():
        s = _wav_pcm_samples(t)
        pays.append(_wav_container(8000 + d, s.tobytes()))
        pays.append(
            _wav_container(16000, np.repeat(s, 2).astype("<i2").tobytes())
        )
        pays.append(_wav_container(8000, (s >> 1).astype("<i2").tobytes()))
    # stereo: channel-0 stride must match s[::2]
    for n in (1, 2, 7, 33):
        left = rng.integers(-32768, 32767, size=n).astype("<i2")
        right = rng.integers(-32768, 32767, size=n).astype("<i2")
        pays.append(_stereo_wav(44100, left, right))
    # odd data length (trailing half-sample ignored by ln // 2)
    odd = _wav_container(8000, _wav_pcm_samples(b"odd length").tobytes())
    pays.append(odd[:-1])
    # int16 extremes (abs(-32768) wrap discipline)
    ext = np.array([-32768, 32767, -1, 0, 1] * 60, dtype="<i2")
    pays.append(_wav_container(8000, ext.tobytes()))
    rows = [(i, bytearray(p)) for i, p in enumerate(pays)]
    rows.append((900, bytearray(b"RIFFxxxx")))  # malformed: dropped
    df = spark.createDataFrame(rows, "aud_id long, payload binary")
    got = {r["aud_id"]: r["afp"] for r in audio_fingerprints(df).collect()}
    assert set(got) == set(range(len(pays)))
    for i, p in enumerate(pays):
        assert got[i] == _expected_afp(p), f"afp mismatch clip {i}"


def test_audio_fingerprints_trim_path_unchanged(spark):
    """trim_silence keeps the scalar path; result equals the documented
    trim-then-fingerprint composition."""
    from hive_serde_schema_gen_spark.operators.media_audio import (
        _trim_silence,
        _wav_decode,
    )

    sam = np.array([0, 0, 5, -300, 12, 0, 0, 0], dtype="<i2")
    pay = _wav_container(8000, sam.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(pay))], "aud_id long, payload binary"
    )
    got = audio_fingerprints(df, trim_silence=True).collect()[0]["afp"]
    assert got == _audio_fp(_trim_silence(sam, 0))


# ---------------------------------------------------------------------------
# video: batched container builder + batched fingerprints
# ---------------------------------------------------------------------------


def test_video_payloads_batch_byte_identical():
    docs, texts, kinds = [], [], []
    expect = []
    for d, t in _rows():
        docs.append(d)
        texts.append(t)
        kinds.append(0)
        expect.append(_video_encode(d, t))
        docs.append(d)
        texts.append(t)
        kinds.append(1)
        expect.append(_video_redub(d, t))
        if t:
            docs.append(d)
            texts.append(t)
            kinds.append(2)
            base = bytearray(_video_encode(d, t))
            base[_VID_HEADER] = 0x5A
            expect.append(bytes(base))
    got = _video_payloads_batch(docs, texts, kinds)
    assert got == expect
    assert _video_payloads_batch([], [], []) == []


def _expected_vfp(payload: bytes, k: int):
    n_frames, frame_len = struct.unpack_from("<II", payload, 4)
    counts = np.zeros(64, dtype=np.int64)
    m = 0
    for f in range(0, n_frames, k):
        off = _VID_HEADER + f * frame_len
        h = _frame_dhash_u(payload[off : off + frame_len])
        counts += (
            (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        m += 1
    maj = int(
        ((2 * counts > m).astype(np.uint64)
         << np.arange(64, dtype=np.uint64)).sum()
    )
    if maj >= 1 << 63:
        maj -= 1 << 64
    return n_frames, m, maj


@pytest.mark.parametrize("every_k", [1, 2, 3])
def test_video_fingerprints_vectorized_matches_scalar(spark, every_k):
    pays = []
    for d, t in _rows():
        pays.append(_video_encode(d, t))
        pays.append(_video_redub(d, t))
    rows = [(i, bytearray(p)) for i, p in enumerate(pays)]
    rows.append((900, bytearray(b"VID0" + struct.pack("<II", 99, 48))))
    rows.append((901, bytearray(b"nope")))
    df = spark.createDataFrame(rows, "vid_id long, payload binary")
    got = {
        r["vid_id"]: (r["n_frames"], r["n_sampled"], r["vfp"])
        for r in video_fingerprints(df, every_k=every_k).collect()
    }
    assert set(got) == set(range(len(pays)))
    for i, p in enumerate(pays):
        assert got[i] == _expected_vfp(p, every_k), f"vfp mismatch {i}"
