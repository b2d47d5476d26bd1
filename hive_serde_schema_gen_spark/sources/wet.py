"""WET (WARC-converted text) source — the raw-crawl entry point of the
web-ingestion chain: Common-Crawl-style ``.wet`` files → one row per
document ``(warc_record_id, url, date, length, text)`` → feed
``operators.html.html_to_text`` (for raw-HTML WARC responses) or directly
into ``operators.corpus.curate_and_prepare``.

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

Real archives are gzip-per-record; this reader takes the UNCOMPRESSED
form (a whole-file .gz of the concatenated records also works — it is
decompressed in the parse pass).  The per-record-gzip variant needs a
record-aware InputFormat and is rejected loudly via
``NotImplementedError`` rather than silently mis-split.

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
_NL = (b"\r\n", b"\n")


def _parse_file(data: bytes):
    """Yield (type, record_id, url, date, length, text) per record."""
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
            break  # trailing junk without a complete header block
        headers = {}
        for line in data[i : m.start()].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip()] = v.strip()
        try:
            length = int(headers.get("Content-Length", ""))
        except ValueError:
            length = None
        if length is None:
            break  # malformed record: cannot locate the payload end
        body = data[m.end() : m.end() + length]
        i = m.end() + length
        yield (
            headers.get("WARC-Type"),
            headers.get("WARC-Record-ID"),
            headers.get("WARC-Target-URI"),
            headers.get("WARC-Date"),
            length,
            body.decode("utf-8", "replace"),
        )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Parse WET files under ``path`` into one row per conversion record:
    ``(warc_record_id, url, date, length, text)``.  ``length`` is the
    declared Content-Length (bytes); ``text`` is the decoded payload.
    ``warcinfo``/non-conversion records are filtered out."""
    if path.endswith(".warc.wet.gz") or path.endswith(".warc.gz"):
        raise NotImplementedError(
            "per-record-gzip WET archives need a record-aware InputFormat; "
            "pre-decompress to .wet (a whole-file .gz of the concatenated "
            "records also works) and point read_wet at that"
        )
    # binaryFile, NOT read.text(wholetext): text decoding replaces invalid
    # UTF-8 bytes with U+FFFD (1 byte -> 3 re-encoded), which would shift
    # every subsequent Content-Length offset — one bad byte in one payload
    # would truncate that record and silently drop the rest of the file.
    # Raw bytes keep the declared lengths exact; only the extracted
    # payload/headers are decoded (with replacement), never the offsets.
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        import gzip

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if p.endswith(".gz"):  # whole-file gzip of the record stream
                    raw = gzip.decompress(raw)
                rows.extend(_parse_file(raw))
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
    return out.filter(F.col("warc_type") == "conversion").drop("warc_type")


def wet_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """The bridge into the curation chain: WET records as a ``documents``-
    shaped frame ``(doc_id, text, lang, source, n_chars)`` — doc_id is the
    xxhash64 of the record id (stable across re-reads), source is the URL
    host, lang is left for ``text_lang_id``-style detection downstream."""
    r = read_wet(spark, path)
    host = F.lower(
        F.regexp_extract(F.col("url"), r"^[a-z]+://(?:www\.)?([^/:]+)", 1)
    )
    return r.select(
        F.xxhash64("warc_record_id").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        host.alias("source"),
        F.length("text").alias("n_chars"),
    )
