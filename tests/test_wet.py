"""WET source: record splitting, header extraction, warcinfo filtering,
LF/CRLF normalization, and the bridge into the curation chain."""

from __future__ import annotations

import os

import pytest

from hive_serde_schema_gen_spark.sources.wet import read_wet, wet_to_documents


def _rec(nl: str, headers: list, payload: str) -> str:
    """One spec-shaped record: headers + Content-Length (byte-accurate)
    + blank line + exactly-that-many payload bytes + two blank lines."""
    hdrs = headers + [f"Content-Length: {len(payload.encode())}"]
    return nl.join(hdrs) + nl + nl + payload + nl + nl


def _wet_bytes(crlf: bool = True) -> str:
    nl = "\r\n" if crlf else "\n"
    return "".join(
        [
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: warcinfo",
                 "WARC-Record-ID: <urn:uuid:info-1>"],
                "robots: ok",
            ),
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: https://www.example.com/page1",
                 "WARC-Date: 2026-08-14T00:00:00Z",
                 "WARC-Record-ID: <urn:uuid:rec-1>"],
                "First document payload.",
            ),
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: http://other.org/a/b",
                 "WARC-Date: 2026-08-14T00:00:01Z",
                 "WARC-Record-ID: <urn:uuid:rec-2>"],
                # payload with an INTERNAL blank line: only Content-Length
                # parsing can split this correctly
                "Second doc." + nl + nl + "With an internal newline.",
            ),
        ]
    )


@pytest.fixture(params=[True, False], ids=["crlf", "lf"])
def wet_path(request, tmp_path):
    p = tmp_path / "part-000.wet"
    p.write_text(_wet_bytes(crlf=request.param))
    return str(p)


def test_read_wet_parses_conversion_records(spark, wet_path):
    rows = {r["warc_record_id"]: r for r in read_wet(spark, wet_path).collect()}
    assert set(rows) == {"<urn:uuid:rec-1>", "<urn:uuid:rec-2>"}  # warcinfo dropped
    r1 = rows["<urn:uuid:rec-1>"]
    assert r1["url"] == "https://www.example.com/page1"
    assert r1["date"] == "2026-08-14T00:00:00Z"
    assert r1["length"] == 23
    assert r1["text"] == "First document payload."


def test_payload_with_internal_blank_line(spark, wet_path):
    """The rec-2 payload contains a blank line — a delimiter-regex split
    would truncate it; Content-Length parsing must not."""
    rows = {r["warc_record_id"]: r for r in read_wet(spark, wet_path).collect()}
    r2 = rows["<urn:uuid:rec-2>"]
    assert r2["text"].startswith("Second doc.")
    assert r2["text"].endswith("With an internal newline.")
    assert r2["length"] == len(r2["text"].encode())


def test_wet_to_documents_bridge(spark, wet_path):
    docs = wet_to_documents(spark, wet_path).collect()
    assert len(docs) == 2
    by_src = {r["source"]: r for r in docs}
    assert set(by_src) == {"example.com", "other.org"}
    for r in docs:
        assert r["n_chars"] == len(r["text"])
        assert isinstance(r["doc_id"], int)


def test_wet_feeds_curation_chain(spark, tmp_path):
    """End-to-end: WET payloads carrying raw HTML -> documents ->
    html_to_text -> boilerplate strip."""
    from hive_serde_schema_gen_spark.operators.dedup import (
        strip_boilerplate_lines,
    )
    from hive_serde_schema_gen_spark.operators.html import html_to_text

    nl = "\r\n"
    recs = []
    for i in range(4):
        payload = (
            f"<html><body><div>Shared navbar</div><p>Page {i} unique body.</p>"
            "</body></html>"
        )
        recs.append(
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 f"WARC-Target-URI: https://site.com/p{i}",
                 f"WARC-Record-ID: <urn:uuid:page-{i}>"],
                payload,
            )
        )
    p = tmp_path / "crawl.wet"
    p.write_text("".join(recs))
    docs = wet_to_documents(spark, str(p))
    cleaned = strip_boilerplate_lines(html_to_text(docs), min_docs=2)
    texts = sorted(r["text"] for r in cleaned.collect())
    assert texts == sorted(f"Page {i} unique body." for i in range(4))


def test_per_record_gzip_parses_identically(spark, tmp_path):
    """The layout Common Crawl actually ships: each record its own gzip
    member, members concatenated.  Must parse byte-identically to the
    uncompressed form — including a member whose payload carries an
    invalid UTF-8 byte (lengths are byte-accurate through decompression)."""
    import gzip

    nl = b"\r\n"
    payloads = [b"first doc", b"bad \xff byte doc", b"third doc"]
    members = []
    plain = b""
    for i, payload in enumerate(payloads):
        rec = (
            nl.join(
                [
                    b"WARC/1.0",
                    b"WARC-Type: conversion",
                    b"WARC-Target-URI: https://x.org/" + str(i).encode(),
                    b"WARC-Record-ID: <urn:uuid:gz-" + str(i).encode() + b">",
                    b"Content-Length: " + str(len(payload)).encode(),
                ]
            )
            + nl + nl + payload + nl + nl
        )
        plain += rec
        members.append(gzip.compress(rec))
    gz = tmp_path / "part-000.warc.wet.gz"
    gz.write_bytes(b"".join(members))
    flat = tmp_path / "part-000.wet"
    flat.write_bytes(plain)
    got_gz = sorted(read_wet(spark, str(gz)).collect())
    got_flat = sorted(read_wet(spark, str(flat)).collect())
    assert got_gz == got_flat
    assert len(got_gz) == 3
    by_id = {r["warc_record_id"]: r for r in got_gz}
    assert by_id["<urn:uuid:gz-1>"]["text"] == payloads[1].decode(
        "utf-8", "replace"
    )
    assert by_id["<urn:uuid:gz-1>"]["length"] == len(payloads[1])


def test_negative_content_length_terminates_with_diagnostic(spark, tmp_path):
    """Adversarial-review finding: a crafted negative Content-Length moved
    the cursor backwards so the header re-matched forever (executor hang).
    Must stop parsing the file AND surface the dropped bytes."""
    nl = b"\r\n"
    good = (
        nl.join(
            [
                b"WARC/1.0", b"WARC-Type: conversion",
                b"WARC-Target-URI: https://ok.org/a",
                b"WARC-Record-ID: <urn:uuid:ok-1>",
                b"Content-Length: 2",
            ]
        )
        + nl + nl + b"ok" + nl + nl
    )
    evil = b"WARC/1.0" + nl + b"Content-Length: -21" + nl + nl + b"payload..."
    f = tmp_path / "evil.wet"
    f.write_bytes(good + evil)
    rows = read_wet(spark, str(f), include_malformed=True).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert [r["warc_record_id"] for r in by_type["conversion"]] == [
        "<urn:uuid:ok-1>"
    ]
    (bad,) = by_type["__malformed__"]
    assert bad["length"] == len(evil)  # every unparsed byte accounted for
    assert "Content-Length" in bad["text"]
    assert bad["url"].endswith("evil.wet")
    # default mode: diagnostics filtered, good record still parsed
    assert [
        r["warc_record_id"] for r in read_wet(spark, str(f)).collect()
    ] == ["<urn:uuid:ok-1>"]


def test_corrupt_midfile_record_reports_bytes_dropped(spark, tmp_path):
    """A record whose header block never terminates: earlier records
    parse, the tail is counted in one diagnostic row."""
    nl = b"\r\n"
    good = (
        nl.join(
            [
                b"WARC/1.0", b"WARC-Type: conversion",
                b"WARC-Target-URI: https://ok.org/a",
                b"WARC-Record-ID: <urn:uuid:ok-1>",
                b"Content-Length: 5",
            ]
        )
        + nl + nl + b"hello" + nl + nl
    )
    tail = b"WARC/1.0" + nl + b"WARC-Type: conversion"  # no blank line ever
    f = tmp_path / "trunc.wet"
    f.write_bytes(good + tail)
    rows = read_wet(spark, str(f), include_malformed=True).collect()
    mal = [r for r in rows if r["warc_type"] == "__malformed__"]
    assert len(mal) == 1
    assert mal[0]["length"] == len(tail)
    assert len([r for r in rows if r["warc_type"] == "conversion"]) == 1


def test_gzip_trailing_junk_reported(spark, tmp_path):
    import gzip

    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:j-1>\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    f = tmp_path / "junk.warc.wet.gz"
    f.write_bytes(gzip.compress(rec) + b"NOT GZIP DATA")
    rows = read_wet(spark, str(f), include_malformed=True).collect()
    mal = [r for r in rows if r["warc_type"] == "__malformed__"]
    assert len(mal) == 1 and mal[0]["length"] == len(b"NOT GZIP DATA")
    assert [r["warc_record_id"] for r in rows if r["warc_type"] == "conversion"] == [
        "<urn:uuid:j-1>"
    ]


def test_invalid_utf8_byte_does_not_desync_record_walk(spark, tmp_path):
    """Review-found bug: a text-decoded read replaces an invalid UTF-8
    byte with U+FFFD (1 byte -> 3 re-encoded), shifting every later
    Content-Length offset — truncating that record and silently dropping
    the rest of the file.  The raw-bytes read must keep both records,
    byte lengths intact."""
    nl = b"\r\n"
    p1 = b"hello \xff world"  # one invalid UTF-8 byte
    p2 = b"clean second payload"
    recs = b""
    for i, payload in enumerate((p1, p2)):
        hdrs = nl.join(
            [
                b"WARC/1.0",
                b"WARC-Type: conversion",
                b"WARC-Target-URI: https://x.org/" + str(i).encode(),
                b"WARC-Record-ID: <urn:uuid:bin-" + str(i).encode() + b">",
                b"Content-Length: " + str(len(payload)).encode(),
            ]
        )
        recs += hdrs + nl + nl + payload + nl + nl
    f = tmp_path / "bin.wet"
    f.write_bytes(recs)
    rows = {r["warc_record_id"]: r for r in read_wet(spark, str(f)).collect()}
    assert set(rows) == {"<urn:uuid:bin-0>", "<urn:uuid:bin-1>"}
    assert rows["<urn:uuid:bin-0>"]["length"] == len(p1)
    assert rows["<urn:uuid:bin-0>"]["text"] == p1.decode("utf-8", "replace")
    assert rows["<urn:uuid:bin-1>"]["text"] == "clean second payload"


def test_source_domain_uses_shared_canonicalization(spark, tmp_path):
    """Review finding: a local host regex kept userinfo
    (http://user@spam.com -> 'user@spam.com') and missed uppercase
    schemes, evading filter_by_domain denylists.  wet_to_documents must
    key through curation.url_domain."""
    nl = "\r\n"
    recs = "".join(
        [
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: http://user@spam.com/x",
                 "WARC-Record-ID: <urn:uuid:d-0>"],
                "userinfo url",
            ),
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: HTTPS://WWW.Example.COM/y",
                 "WARC-Record-ID: <urn:uuid:d-1>"],
                "uppercase scheme",
            ),
        ]
    )
    p = tmp_path / "dom.wet"
    p.write_text(recs)
    sources = {
        r["text"]: r["source"]
        for r in wet_to_documents(spark, str(p)).collect()
    }
    assert sources == {
        "userinfo url": "spam.com",
        "uppercase scheme": "example.com",
    }


def test_whole_file_gzip_supported(spark, tmp_path):
    import gzip

    raw = _wet_bytes(crlf=True).encode()
    f = tmp_path / "part-000.wet.gz"
    f.write_bytes(gzip.compress(raw))
    rows = read_wet(spark, str(f)).collect()
    assert {r["warc_record_id"] for r in rows} == {
        "<urn:uuid:rec-1>", "<urn:uuid:rec-2>",
    }


def test_truncated_payload_reported_not_silently_shortened(spark, tmp_path):
    """A record whose declared Content-Length runs past EOF (truncated
    download) must become a diagnostic row, never a silently-short
    payload."""
    nl = b"\r\n"
    good = (
        nl.join(
            [
                b"WARC/1.0", b"WARC-Type: conversion",
                b"WARC-Record-ID: <urn:uuid:t-0>", b"Content-Length: 3",
            ]
        )
        + nl + nl + b"abc" + nl + nl
    )
    cut = (
        b"WARC/1.0" + nl + b"WARC-Type: conversion" + nl
        + b"WARC-Record-ID: <urn:uuid:t-1>" + nl
        + b"Content-Length: 1000" + nl + nl + b"only a few bytes"
    )
    f = tmp_path / "cut.wet"
    f.write_bytes(good + cut)
    rows = read_wet(spark, str(f), include_malformed=True).collect()
    conv = [r for r in rows if r["warc_type"] == "conversion"]
    mal = [r for r in rows if r["warc_type"] == "__malformed__"]
    assert [r["warc_record_id"] for r in conv] == ["<urn:uuid:t-0>"]
    assert len(mal) == 1
    assert mal[0]["length"] == len(cut)
    assert "truncated" in mal[0]["text"]


def _warc_response(rid, url, status, ctype, body: bytes, nl=b"\r\n"):
    http = (
        f"HTTP/1.1 {status} X".encode() + nl
        + f"Content-Type: {ctype}".encode() + nl
        + b"Server: test" + nl + nl + body
    )
    return (
        nl.join(
            [
                b"WARC/1.0",
                b"WARC-Type: response",
                b"WARC-Target-URI: " + url.encode(),
                b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
                b"Content-Length: " + str(len(http)).encode(),
            ]
        )
        + nl + nl + http + nl + nl
    )


def test_warc_responses_html_filter_and_gzip_parity(spark, tmp_path):
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    recs = [
        _warc_response("w-1", "https://a.org/x", 200, "text/html; charset=utf-8",
                       b"<html><body><p>Hello page</p></body></html>"),
        _warc_response("w-2", "https://a.org/404", 404, "text/html",
                       b"<html>not found</html>"),
        _warc_response("w-3", "https://a.org/img", 200, "image/png",
                       b"\x89PNG fake"),
        _warc_response("w-4", "https://b.org/y", 200, "application/xhtml+xml",
                       b"<html><body>Second page</body></html>"),
    ]
    plain = b"".join(recs)
    f = tmp_path / "crawl.warc"
    f.write_bytes(plain)
    import gzip

    gz = tmp_path / "crawl2.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in recs))

    rows = {r["warc_record_id"]: r for r in read_warc_responses(spark, str(f)).collect()}
    # 2xx + html-ish only
    assert set(rows) == {"<urn:uuid:w-1>", "<urn:uuid:w-4>"}
    assert rows["<urn:uuid:w-1>"]["status"] == 200
    assert rows["<urn:uuid:w-1>"]["text"].startswith("<html>")
    assert "Hello page" in rows["<urn:uuid:w-1>"]["text"]
    # full fetch log keeps everything
    all_rows = read_warc_responses(spark, str(f), html_only=False).collect()
    assert len(all_rows) == 4
    # per-record gzip parses identically
    got_gz = sorted(map(tuple, read_warc_responses(spark, str(gz)).collect()))
    got_flat = sorted(map(tuple, read_warc_responses(spark, str(f)).collect()))
    assert got_gz == got_flat


def test_warc_to_documents_strips_html(spark, tmp_path):
    from hive_serde_schema_gen_spark.sources.wet import warc_to_documents

    f = tmp_path / "crawl.warc"
    f.write_bytes(
        _warc_response(
            "w-9", "HTTPS://WWW.Site.ORG/p", 200, "text/html",
            b"<html><body><h1>Title</h1><p>Body text here.</p></body></html>",
        )
    )
    docs = warc_to_documents(spark, str(f)).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["source"] == "site.org"
    assert "Title" in d["text"] and "Body text here." in d["text"]
    assert "<" not in d["text"]


def test_warc_documents_n_chars_describes_stripped_text(spark, tmp_path):
    from hive_serde_schema_gen_spark.sources.wet import warc_to_documents

    f = tmp_path / "c.warc"
    f.write_bytes(
        _warc_response("w-8", "https://s.org/q", 200, "text/html",
                       b"<html><body><p>abc</p></body></html>")
    )
    d = warc_to_documents(spark, str(f)).collect()[0]
    assert d["n_chars"] == len(d["text"])  # post-strip, not raw HTML


def test_web_corpus_from_crawl_end_to_end(spark, tmp_path):
    """The one-call crawl → manifest composition: URL-level dedup collapses
    tracking-parameter republications before content work, then the full
    curation chain produces the packed/split manifest."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        web_corpus_from_crawl,
    )

    nl = "\r\n"
    body_a = " ".join(f"alpha{i} the of to is" for i in range(20))
    body_b = " ".join(f"beta{i} and a it for" for i in range(20))
    recs = "".join(
        [
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: https://s.org/a?utm_source=tw",
                 "WARC-Record-ID: <urn:uuid:c-0>"],
                body_a,
            ),
            # same page, different campaign tag: URL dedup must collapse it
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: https://s.org/a?utm_source=fb",
                 "WARC-Record-ID: <urn:uuid:c-1>"],
                body_a,
            ),
            _rec(
                nl,
                ["WARC/1.0", "WARC-Type: conversion",
                 "WARC-Target-URI: https://s.org/b",
                 "WARC-Record-ID: <urn:uuid:c-2>"],
                body_b,
            ),
        ]
    )
    p = tmp_path / "crawl.wet"
    p.write_text(recs)
    manifest = web_corpus_from_crawl(
        spark, str(p), kind="wet", quality_floor=0.0
    ).collect()
    assert len(manifest) == 2  # one per distinct page
    assert all(r["n_chunks"] >= 1 and r["split"] in ("train", "val", "test")
               for r in manifest)


def test_crawl_report(spark, tmp_path):
    from hive_serde_schema_gen_spark.sources.wet import crawl_report

    nl = "\r\n"
    (tmp_path / "good.wet").write_text(_wet_bytes(crlf=True))
    (tmp_path / "bad.wet").write_bytes(
        b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxxxx"
    )
    r = crawl_report(spark, str(tmp_path / "*.wet")).collect()[0]
    assert r["n_records"] == 2  # conversion records (warcinfo excluded)
    assert r["n_malformed_files"] == 1
    assert r["bytes_dropped"] == len(
        b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxxxx"
    )
    assert r["total_payload_bytes"] > 0 and r["n_empty"] == 0


def test_web_corpus_from_crawl_warc_kind(spark, tmp_path):
    from hive_serde_schema_gen_spark.operators.corpus import (
        web_corpus_from_crawl,
    )

    body = (
        "<html><body><p>"
        + " ".join(f"gamma{i} the of to is and a" for i in range(15))
        + "</p></body></html>"
    ).encode()
    f = tmp_path / "c.warc"
    f.write_bytes(
        _warc_response("wc-1", "https://w.org/a?utm_source=x", 200,
                       "text/html", body)
        + _warc_response("wc-2", "https://w.org/a?utm_source=y", 200,
                         "text/html", body)  # URL-dedup collapses
    )
    manifest = web_corpus_from_crawl(
        spark, str(f), kind="warc", quality_floor=0.0
    ).collect()
    assert len(manifest) == 1
    assert manifest[0]["n_chunks"] >= 1


# ---------------------------------------------------------------------------
# Round-10: charset-aware body decode (HTTP header / <meta> / BOM sniffing)
# ---------------------------------------------------------------------------


def test_warc_charset_from_http_header_latin1(spark, tmp_path):
    """A page declaring charset=iso-8859-1 in the HTTP header decodes via
    windows-1252 (the WHATWG label mapping), not mojibake'd utf-8."""
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    text = "caféré à côté"
    body = f"<html><body><p>{text}</p></body></html>".encode("latin-1")
    f = tmp_path / "l1.warc"
    f.write_bytes(
        _warc_response(
            "cs-1", "https://l.org/a", 200,
            "text/html; charset=iso-8859-1", body,
        )
    )
    rows = read_warc_responses(spark, str(f)).collect()
    assert len(rows) == 1
    assert text in rows[0]["text"]
    assert "�" not in rows[0]["text"]


def test_warc_charset_from_meta_tag_shift_jis(spark, tmp_path):
    """No charset in the HTTP header: the <meta> declaration within the
    1024-byte prescan window drives the decode (shift_jis → cp932)."""
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    text = "日本語のページです"
    html = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=shift_jis"></head>'
        f"<body><p>{text}</p></body></html>"
    )
    body = html.encode("cp932")
    f = tmp_path / "sj.warc"
    f.write_bytes(
        _warc_response("cs-2", "https://j.example/p", 200, "text/html", body)
    )
    rows = read_warc_responses(spark, str(f)).collect()
    assert len(rows) == 1
    assert text in rows[0]["text"]
    assert "�" not in rows[0]["text"]


def test_warc_charset_header_beats_meta(spark, tmp_path):
    """HTTP-header charset outranks a conflicting <meta> (the WHATWG
    precedence): a cp932 body whose meta lies utf-8 still decodes right
    when the header says shift_jis."""
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    text = "表計算ソフト"
    html = f'<html><head><meta charset="utf-8"></head><body>{text}</body></html>'
    body = html.encode("cp932")
    f = tmp_path / "hm.warc"
    f.write_bytes(
        _warc_response(
            "cs-3", "https://j.example/q", 200,
            "text/html; charset=shift_jis", body,
        )
    )
    rows = read_warc_responses(spark, str(f)).collect()
    assert text in rows[0]["text"]


def test_warc_charset_bom_wins(spark, tmp_path):
    """A UTF-8 BOM outranks everything — and is stripped from the text."""
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    text = "straße"
    body = b"\xef\xbb\xbf" + f"<html><body>{text}</body></html>".encode("utf-8")
    f = tmp_path / "bom.warc"
    f.write_bytes(
        _warc_response(
            "cs-4", "https://b.example/r", 200,
            "text/html; charset=iso-8859-1", body,
        )
    )
    rows = read_warc_responses(spark, str(f)).collect()
    assert text in rows[0]["text"]
    assert "﻿" not in rows[0]["text"]


def test_warc_charset_unknown_falls_back_utf8(spark, tmp_path):
    """A bogus charset label degrades to the prior utf-8-replace behavior,
    never an abort; valid UTF-8 pages are bit-identical to before."""
    from hive_serde_schema_gen_spark.sources.wet import read_warc_responses

    text = "plain utf-8 Ωμέγα"
    body = f"<html><body>{text}</body></html>".encode("utf-8")
    f = tmp_path / "bogus.warc"
    f.write_bytes(
        _warc_response(
            "cs-5", "https://u.example/s", 200,
            "text/html; charset=no-such-encoding-9x", body,
        )
        + _warc_response("cs-6", "https://u.example/t", 200, "text/html", body)
    )
    rows = {
        r["warc_record_id"]: r
        for r in read_warc_responses(spark, str(f)).collect()
    }
    assert text in rows["<urn:uuid:cs-5>"]["text"]
    assert text in rows["<urn:uuid:cs-6>"]["text"]


def test_python_xxhash64_matches_spark(spark):
    """The pure-Python XXH64 (functions.xxh) that precomputes the crawl
    slot's oracle id mapping must equal Spark's F.xxhash64 bit-for-bit —
    over the actual record-id shapes plus length-edge cases (empty,
    <4, <8, <32, >=32 bytes)."""
    from pyspark.sql import functions as F

    from hive_serde_schema_gen_spark.functions.xxh import xxhash64
    from hive_serde_schema_gen_spark.operators.corpus import _crawl_record_id

    samples = [_crawl_record_id(o) for o in (0, 7, 59, 119)] + [
        "", "a", "abc", "abcdefg", "0123456789abcdef",
        "x" * 31, "x" * 32, "x" * 100, "日本語テキスト",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in samples:
        assert got[s] == xxhash64(s.encode("utf-8")), s
