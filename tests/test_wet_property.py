"""Property tests for the WET record walk (pure Python — the parse core
``_parse_file`` runs without Spark): any rendered record stream parses
back to exactly the records that were rendered, byte lengths intact,
under arbitrary payload bytes (including blank lines, ``WARC/1.0``-
lookalike text, and invalid UTF-8) and under per-record gzip."""

from __future__ import annotations

import gzip

from hypothesis import given, settings, strategies as st

from hive_serde_schema_gen_spark.sources.wet import MALFORMED, _parse_file

payloads = st.lists(
    st.binary(min_size=0, max_size=200), min_size=1, max_size=8
)
nls = st.sampled_from([b"\r\n", b"\n"])


def _render(recs, nl, start: int = 0):
    out = b""
    for i, payload in enumerate(recs, start=start):
        out += (
            nl.join(
                [
                    b"WARC/1.0",
                    b"WARC-Type: conversion",
                    b"WARC-Target-URI: https://x.org/" + str(i).encode(),
                    b"WARC-Record-ID: <urn:uuid:p-" + str(i).encode() + b">",
                    b"Content-Length: " + str(len(payload)).encode(),
                ]
            )
            + nl + nl + payload + nl + nl
        )
    return out


def _conversions(data):
    return [r for r in _parse_file(data) if r[0] == "conversion"]


@settings(max_examples=200, deadline=None)
@given(payloads, nls)
def test_roundtrip_arbitrary_payload_bytes(recs, nl):
    got = _conversions(_render(recs, nl))
    assert len(got) == len(recs)
    for i, (payload, row) in enumerate(zip(recs, got)):
        _, rid, url, _, length, text = row
        assert rid == f"<urn:uuid:p-{i}>"
        assert length == len(payload)
        assert text == payload.decode("utf-8", "replace")


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_per_record_gzip_equals_plain(recs):
    plain = _render(recs, b"\r\n")
    members = b"".join(
        gzip.compress(_render([p], b"\r\n", start=i))
        for i, p in enumerate(recs)
    )
    assert list(_parse_file(members)) == list(_parse_file(plain))


@settings(max_examples=100, deadline=None)
@given(payloads, st.binary(min_size=1, max_size=50))
def test_trailing_junk_always_counted_never_looped(recs, junk):
    """Any trailing garbage after valid records either parses as more
    records or lands in exactly one MALFORMED row counting every byte —
    and parsing always terminates (the cursor-advance guarantee)."""
    data = _render(recs, b"\r\n") + junk
    rows = list(_parse_file(data, src="f"))
    convs = [r for r in rows if r[0] == "conversion"]
    assert len(convs) >= len(recs)
    mal = [r for r in rows if r[0] == MALFORMED]
    assert len(mal) <= 1
    if mal:
        assert 0 < mal[0][4] <= len(junk) + 4  # skipped bytes bounded
