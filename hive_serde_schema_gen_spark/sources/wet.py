"""WET / WARC crawl sources — the raw-crawl entry points of the
web-ingestion chain.  Three readers over one shared record walk:

- :func:`read_wet` — Common-Crawl ``.wet`` conversion records (already
  extracted text) → ``operators.corpus.curate_and_prepare``;
- :func:`read_wet_stream` / :func:`wet_documents_stream` — the same as a
  Structured Streaming source for continuous-crawl ingest;
- :func:`read_warc_responses` / :func:`warc_to_documents` — RAW ``.warc``
  response archives (full HTTP responses with HTML bodies) →
  ``operators.html.html_to_text`` → the same curation chain.

Format (public spec, ISO 28500 WARC 1.0 applied to the conversion
profile): a WET file is a sequence of records, each

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: <url>
    WARC-Date: <iso8601>
    WARC-Record-ID: <urn:uuid:...>
    Content-Length: <bytes>
    <blank line>
    <payload: exactly Content-Length BYTES>
    <blank line><blank line>

plus one leading ``warcinfo`` record per file.

Parsing is Content-Length-driven on BYTES (an Arrow-batched
``mapInPandas`` walk, the same per-file Python shape as the multimodal
container decoders) — NOT a delimiter regex: payloads legitimately
contain blank lines and even ``WARC/1.0``-looking text, so only the
declared byte length splits records correctly.  Both CRLF (spec) and
bare-LF (hand-made fixtures) header termination are accepted.

Compression: real Common Crawl archives are PER-RECORD gzip — each
record is its own gzip member and the file is the members concatenated
(``.warc.wet.gz``).  Because concatenated members decompress to exactly
the concatenated record stream, the reader handles per-record gzip,
whole-file gzip, and uncompressed files identically: any content
starting with the gzip magic is walked member by member
(``zlib.decompressobj``; ``unused_data`` locates each member boundary)
and the decompressed stream feeds the same Content-Length walk.
Detection is by MAGIC BYTES, not extension, so misnamed files parse
correctly too.

Malformed input is OBSERVABLE, never an infinite loop: a record whose
Content-Length is missing, unparseable, or NEGATIVE (a crafted negative
length would otherwise move the cursor backwards and re-match the same
header forever — adversarial-review finding), and trailing bytes that
form no complete header block or no complete gzip member, each stop the
walk for that file and emit ONE diagnostic row with
``warc_type='__malformed__'``, ``url`` = the file path, ``length`` = the
count of unparsed bytes skipped, ``text`` = the reason.  The default
``read_wet`` filter drops these rows (the happy path is unchanged);
``include_malformed=True`` keeps them so pipelines can count / alert on
truncation at scale instead of silently losing the tail of a file.

Scale shape: ``spark.read.format("binaryFile")`` gives one RAW-BYTES row
per file (raw on purpose: a text read would substitute U+FFFD for any
invalid UTF-8 byte and shift every later Content-Length offset —
regression-tested); WET files are written ~1 GiB each precisely so
file-granular parallelism is sufficient (the standard Common Crawl
processing shape: thousands of files, one task each).  The record walk
is per-file local — no shuffle anywhere; downstream operators
repartition as they need.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_SCHEMA = (
    "warc_type string, warc_record_id string, url string, date string, "
    "length long, text string"
)

_HDR_END = re.compile(rb"\r?\n\r?\n")
_GZIP_MAGIC = b"\x1f\x8b"
MALFORMED = "__malformed__"


def _gunzip_members(data: bytes):
    """Decompress a concatenated-gzip-member stream (the per-record-gzip
    WET layout; a whole-file gzip is the 1-member special case).

    Returns ``(decompressed_bytes, junk_bytes, reason)`` where
    ``junk_bytes`` counts trailing bytes that formed no complete member
    (0 on clean input) and ``reason`` describes why the walk stopped."""
    import zlib

    out = []
    # memoryview: a real Common Crawl file holds tens of thousands of
    # members, and a bytes slice per member would copy the remaining
    # tail each time — O(members × filesize) memory traffic.  Viewing
    # makes each per-member slice O(1).
    mv = memoryview(data)
    i = 0
    n = len(data)
    reason = None
    while i < n:
        if bytes(mv[i : i + 2]) != _GZIP_MAGIC:
            reason = "trailing non-gzip bytes after last member"
            break
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(mv[i:]))
            out.append(d.flush())
        except zlib.error:
            reason = "corrupt gzip member"
            break
        if not d.eof:
            reason = "truncated gzip member"
            break
        consumed = (n - i) - len(d.unused_data)
        if consumed <= 0:  # defensive: cannot stall the walk
            reason = "gzip member consumed no input"
            break
        i += consumed
    return b"".join(out), n - i, reason


def _parse_file(data: bytes, src: str = "", raw: bool = False):
    """Yield (type, record_id, url, date, length, text) per record;
    ``raw=True`` yields the payload as BYTES instead of a replace-decoded
    string (the WARC-response path splits HTTP headers byte-accurately
    before deciding how to decode the body).

    On malformed input the walk STOPS for this file (consistent with the
    Content-Length discipline: once a length is untrustworthy every later
    offset is too) and yields one ``MALFORMED`` diagnostic row carrying
    the unparsed byte count and the reason — truncation is observable,
    never silent."""
    if data[:2] == _GZIP_MAGIC:
        data, junk, gz_reason = _gunzip_members(data)
        if junk:
            yield (MALFORMED, None, src, None, junk, gz_reason)
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record blank lines
        while True:
            if data[i : i + 2] == b"\r\n":
                i += 2
            elif data[i : i + 1] == b"\n":
                i += 1
            else:
                break
        if i >= n:
            break
        m = _HDR_END.search(data, i)
        if m is None:
            yield (
                MALFORMED, None, src, None, n - i,
                "trailing bytes without a complete header block",
            )
            break
        headers = {}
        for line in data[i : m.start()].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip()] = v.strip()
        try:
            length = int(headers.get("Content-Length", ""))
        except ValueError:
            length = None
        if length is None or length < 0:
            # missing/unparseable/NEGATIVE length: the payload end is
            # unlocatable (and a negative length would move the cursor
            # BACKWARDS — the infinite-loop finding); stop, observably.
            yield (
                MALFORMED, None, src, None, n - i,
                f"malformed Content-Length "
                f"{headers.get('Content-Length')!r}",
            )
            break
        if m.end() + length > n:
            # declared payload runs past EOF (truncated download): a
            # short body under the declared length would silently corrupt
            # the record — report the whole tail as dropped instead.
            yield (
                MALFORMED, None, src, None, n - i,
                f"payload truncated: Content-Length {length} exceeds "
                f"remaining {n - m.end()} bytes",
            )
            break
        body = data[m.end() : m.end() + length]
        i = m.end() + length  # > header start: the cursor always advances
        yield (
            headers.get("WARC-Type"),
            headers.get("WARC-Record-ID"),
            headers.get("WARC-Target-URI"),
            headers.get("WARC-Date"),
            length,
            body if raw else body.decode("utf-8", "replace"),
        )


# binaryFile's fixed schema — needed explicitly for the STREAMING reader
# (file streaming sources require a user schema).
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _records_of(files: DataFrame, include_malformed: bool) -> DataFrame:
    """The shared parse tail over a (batch OR streaming) binaryFile frame —
    the mapInPandas walk is stateless, so the identical pipeline serves
    both execution modes."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_file(bytes(content), src=p))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_type",
                    "warc_record_id",
                    "url",
                    "date",
                    "length",
                    "text",
                ],
            )

    out = files.mapInPandas(parse, _SCHEMA)
    if include_malformed:
        return out.filter(
            F.col("warc_type").isin("conversion", MALFORMED)
        )
    return out.filter(F.col("warc_type") == "conversion").drop("warc_type")


def read_wet(
    spark: SparkSession, path: str, include_malformed: bool = False
) -> DataFrame:
    """Parse WET files under ``path`` into one row per conversion record:
    ``(warc_record_id, url, date, length, text)``.  ``length`` is the
    declared Content-Length (bytes); ``text`` is the decoded payload.
    ``warcinfo``/non-conversion records are filtered out.

    Accepts uncompressed ``.wet``, whole-file gzip, and the per-record
    gzip ``.warc.wet.gz`` layout Common Crawl distributes — compression
    is detected by magic bytes and handled in the same per-file pass.

    ``include_malformed=True`` keeps the ``warc_type`` column and adds
    one ``'__malformed__'`` diagnostic row per file whose walk stopped
    early (url = file path, length = bytes skipped, text = reason), so
    ingest jobs can count dropped data instead of losing it silently."""
    # binaryFile, NOT read.text(wholetext): text decoding replaces invalid
    # UTF-8 bytes with U+FFFD (1 byte -> 3 re-encoded), which would shift
    # every subsequent Content-Length offset — one bad byte in one payload
    # would truncate that record and silently drop the rest of the file.
    # Raw bytes keep the declared lengths exact; only the extracted
    # payload/headers are decoded (with replacement), never the offsets.
    files = spark.read.format("binaryFile").load(path)
    return _records_of(files, include_malformed)


def read_wet_stream(
    spark: SparkSession, path: str, include_malformed: bool = False
) -> DataFrame:
    """STREAMING form of :func:`read_wet` — the continuous-crawl front
    end: new ``.wet`` / ``.warc.wet.gz`` files landing under ``path``
    become micro-batches of conversion records (binaryFile is a standard
    file streaming source once given its schema; each file is parsed
    exactly once, tracked by the query's checkpoint).  Identical parse
    pipeline to the batch form — compose with
    ``streaming.ingest.start_ingest_dedup`` via
    :func:`wet_documents_stream` for the full crawl → dedup-gated corpus
    path (tested end to end in tests/test_wet_stream.py)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
    )
    return _records_of(files, include_malformed)


def _documents_projection(records: DataFrame) -> DataFrame:
    """records → ``documents``-shaped frame (shared batch/stream tail).
    Carries the raw ``url`` as an extra column beyond the core documents
    shape — URL-level dedup (``curation.dedup_by_url``) keys on it, and
    every other operator simply ignores it."""
    from ..operators.curation import url_domain

    return records.select(
        F.xxhash64("warc_record_id").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        url_domain(F.col("url")).alias("source"),
        F.length("text").alias("n_chars"),
        "url",
    )


def wet_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """The bridge into the curation chain: WET records as a ``documents``-
    shaped frame ``(doc_id, text, lang, source, n_chars)`` — doc_id is the
    xxhash64 of the record id (stable across re-reads), source is the URL
    host canonicalized by ``curation.url_domain`` (THE single URL→domain
    rule: userinfo stripped, case-folded, ``www.`` removed — a local
    regex here once diverged and let ``http://user@spam.com`` evade a
    domain denylist; adversarial-review finding), lang is left for
    ``text_lang_id``-style detection downstream."""
    return _documents_projection(read_wet(spark, path))


def wet_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING ``wet_to_documents`` — the continuous-crawl composition
    point: feed directly to ``streaming.ingest.start_ingest_dedup`` so
    every arriving WET file is parsed, probed against the persisted
    MinHash index, and only novel documents land in the curated corpus
    and extend the index.  Same projection as the batch form."""
    return _documents_projection(read_wet_stream(spark, path))


# ---------------------------------------------------------------------------
# WARC response records (raw-HTML crawls — the non-WET Common Crawl layout)
# ---------------------------------------------------------------------------

_HTTP_HDR_END = re.compile(rb"\r?\n\r?\n")

# charset=<token> — works on both the HTTP Content-Type header value and
# the raw <meta> bytes of an HTML head (attribute quoting optional).
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", re.I)
# HTML5's encoding prescan examines the first 1024 bytes for <meta>.
_META_SNIFF_WINDOW = 1024

# WHATWG Encoding Standard label→codec choices for the big real-crawl
# offenders: latin-1 labels mean windows-1252 in browsers (the superset
# every server that says iso-8859-1 actually serves), gb2312 means GBK,
# shift_jis means windows-31j (cp932).  Everything else goes through
# Python's codec registry by its own name.
_CHARSET_ALIASES = {
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "gb2312": "gbk",
    "gb_2312-80": "gbk",
    "shift_jis": "cp932",
    "shift-jis": "cp932",
    "sjis": "cp932",
    "x-sjis": "cp932",
    "utf8": "utf-8",
}


def _resolve_charset(label: bytes):
    """charset label bytes → Python codec name, or None if unknown (the
    caller falls back to utf-8-replace rather than guessing)."""
    import codecs

    name = label.decode("ascii", "replace").strip().lower()
    name = _CHARSET_ALIASES.get(name, name)
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def _decode_body(body: bytes, content_type) -> str:
    """Charset-aware decode of an HTTP body (round-10: real crawls ship
    latin-1 / shift-jis / gbk pages whose text the old utf-8-replace
    decode mojibake'd before ``html_to_text`` ever saw it).  Precedence
    per the WHATWG sniffing order:

    1. a byte-order mark (UTF-8 / UTF-16 LE / BE) wins outright;
    2. the HTTP ``Content-Type`` header's ``charset`` parameter;
    3. an HTML ``<meta charset>`` / ``http-equiv`` declaration within the
       first 1024 bytes (the spec's prescan window), matched on RAW bytes
       so the sniff itself needs no decode;
    4. fallback: utf-8 with replacement (unchanged prior behavior).

    Always ``errors="replace"`` — a lying charset degrades to U+FFFD
    noise, never a parse abort.  Only the extracted body is ever decoded;
    the Content-Length record walk stays on raw bytes."""
    if body[:3] == b"\xef\xbb\xbf":
        return body.decode("utf-8-sig", "replace")
    if body[:2] == b"\xff\xfe":
        return body.decode("utf-16-le", "replace")[1:]
    if body[:2] == b"\xfe\xff":
        return body.decode("utf-16-be", "replace")[1:]
    codec = None
    if content_type:
        m = _CHARSET_RE.search(content_type.encode("ascii", "replace"))
        if m:
            codec = _resolve_charset(m.group(1))
    if codec is None:
        m = _CHARSET_RE.search(body[:_META_SNIFF_WINDOW])
        if m:
            codec = _resolve_charset(m.group(1))
    return body.decode(codec or "utf-8", "replace")


def _split_http_payload(payload: bytes):
    """A WARC ``response`` record's payload is a full HTTP response:
    status line + headers + blank line + body.  Returns
    (status_code, content_type, body_bytes); a payload with no header
    terminator is treated as all-body with unknown status (lenient — the
    caller filters on content_type when it matters)."""
    m = _HTTP_HDR_END.search(payload)
    if m is None:
        return None, None, payload
    head = payload[: m.start()].decode("utf-8", "replace")
    lines = head.splitlines()
    status = None
    if lines and lines[0].upper().startswith("HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
                break
    return status, ctype, payload[m.end() :]


def read_warc_responses(
    spark: SparkSession,
    path: str,
    html_only: bool = True,
    include_malformed: bool = False,
) -> DataFrame:
    """Parse RAW WARC archives (``.warc`` / ``.warc.gz``, the response
    layout Common Crawl ships alongside WET) into one row per fetched
    page: ``(warc_record_id, url, date, status, content_type, length,
    text)`` where ``text`` is the HTTP BODY (raw HTML for pages) — feed
    straight into ``operators.html.html_to_text``.

    Same byte-accurate Content-Length walk, per-record-gzip handling, and
    malformed-input discipline as :func:`read_wet` (one shared
    ``_parse_file``); the only addition is the HTTP response split inside
    each record payload.  ``html_only=True`` keeps 2xx responses whose
    Content-Type says html (the crawl-pipeline default); pass ``False``
    for the full fetch log (redirects, assets, errors).
    ``include_malformed=True`` adds one diagnostic row per file whose
    record walk stopped early (``content_type='__malformed__'``, url =
    file path, length = bytes skipped, text = reason) — the same
    truncation observability as :func:`read_wet`."""
    files = spark.read.format("binaryFile").load(path)
    return _warc_records_of(files, html_only, include_malformed)


def _warc_records_of(
    files: DataFrame, html_only: bool, include_malformed: bool
) -> DataFrame:
    """The shared WARC-response parse tail over a (batch OR streaming)
    binaryFile frame — stateless, so one pipeline serves both modes."""

    def parse(batches):
        import pandas as pd

        cols = [
            "warc_record_id", "url", "date", "status", "content_type",
            "length", "text",
        ]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for (
                    wtype, rid, url, date, length, payload
                ) in _parse_file(bytes(content), src=p, raw=True):
                    if wtype == MALFORMED:
                        if include_malformed:
                            rows.append(
                                (None, url, None, None, MALFORMED,
                                 length, payload)
                            )
                        continue
                    if wtype != "response":
                        continue
                    status, ctype, body = _split_http_payload(payload)
                    rows.append(
                        (
                            rid, url, date, status, ctype,
                            len(body), _decode_body(body, ctype),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    out = files.mapInPandas(
        parse,
        "warc_record_id string, url string, date string, status int, "
        "content_type string, length long, text string",
    )
    if html_only:
        keep = (
            (F.col("status") >= 200) & (F.col("status") < 300)
            & F.lower(F.col("content_type")).contains("html")
        )
        if include_malformed:  # diagnostics survive the page filter
            keep = keep | (F.col("content_type") == MALFORMED)
        out = out.filter(keep)
    return out


def warc_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """WARC responses → ``documents``-shaped frame with the HTML already
    stripped to text: the complete raw-crawl ingestion front-end
    (``read_warc_responses`` → ``html.html_to_text`` → the shared
    documents projection).  Compose the result with
    ``corpus.curate_and_prepare`` exactly like ``wet_to_documents``."""
    from ..operators.html import html_to_text

    # strip FIRST: the projection's n_chars must describe the extracted
    # text the row carries, not the raw HTML it came from
    r = html_to_text(read_warc_responses(spark, path))
    return _documents_projection(r)


def crawl_report(spark: SparkSession, path: str) -> DataFrame:
    """One-aggregate health summary of a crawl directory — the
    observability face of the malformed-row discipline: conversion-record
    count (warcinfo excluded), malformed-file count, dropped bytes,
    payload bytes, empty-payload count.
    ``bytes_dropped`` sums the diagnostic rows' skipped-byte counts, so
    "how much of this crawl did we fail to parse" is one number instead
    of a silent loss.  Runs the same per-file walk as ``read_wet`` — one
    pass, no shuffle beyond the final 1-row aggregate."""
    r = read_wet(spark, path, include_malformed=True)
    is_mal = F.col("warc_type") == MALFORMED
    return r.agg(
        F.countDistinct(F.when(is_mal, F.col("url"))).alias(
            "n_malformed_files"
        ),
        F.sum(F.when(is_mal, F.col("length")).otherwise(0)).alias(
            "bytes_dropped"
        ),
        F.count(F.when(~is_mal, 1)).alias("n_records"),
        F.sum(F.when(~is_mal, F.col("length")).otherwise(0)).alias(
            "total_payload_bytes"
        ),
        F.count(
            F.when(~is_mal & (F.col("length") == 0), 1)
        ).alias("n_empty"),
    )


def read_warc_responses_stream(
    spark: SparkSession, path: str, html_only: bool = True
) -> DataFrame:
    """STREAMING form of :func:`read_warc_responses` — new raw ``.warc.gz``
    files landing under ``path`` become micro-batches of fetched pages
    (the same explicit-schema binaryFile source as
    :func:`read_wet_stream`).  Compose with ``html.html_to_text`` +
    ``streaming.ingest`` for a continuous raw-HTML crawl pipeline."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .load(path)
    )
    return _warc_records_of(files, html_only, include_malformed=False)
