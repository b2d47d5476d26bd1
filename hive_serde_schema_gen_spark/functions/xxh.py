"""Pure-Python XXH64 — the same public hash Spark's ``F.xxhash64`` applies
to string columns (XXH64 over the UTF-8 bytes, seed 42; algorithm per the
public xxHash specification, github.com/Cyan4973/xxHash).

Why it exists: DuckDB has no xxhash64, so an oracle that must re-derive a
Spark-side ``xxhash64(...)`` id (e.g. the crawl slot's
``doc_id = xxhash64(warc_record_id)``) embeds a small precomputed
(plain id → hash) VALUES mapping instead — computed HERE at import time,
verified against Spark in tests/test_wet.py.  This is oracle plumbing
only; production hashing always runs JVM-side via ``F.xxhash64``.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int — the value
    ``F.xxhash64(string_col)`` produces for the same UTF-8 bytes (Spark's
    default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M

        def rnd(v: int, chunk: bytes) -> int:
            return (
                _rotl((v + int.from_bytes(chunk, "little") * _P2) & _M, 31)
                * _P1
            ) & _M

        while i + 32 <= n:
            v1 = rnd(v1, data[i : i + 8])
            v2 = rnd(v2, data[i + 8 : i + 16])
            v3 = rnd(v3, data[i + 16 : i + 24])
            v4 = rnd(v4, data[i + 24 : i + 32])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (
            (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2)
            + _P3
        ) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
