"""Continuous-crawl composition: streaming WET source → documents
projection → ingest dedup against the persisted MinHash index.  New
.warc.wet.gz files landing in a directory become micro-batches; novel
documents land in epoch dirs and extend the index, near-duplicates of
anything ever accepted never land."""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile

import pytest

from hive_serde_schema_gen_spark.operators.dedup_index import build_minhash_index
from hive_serde_schema_gen_spark.sources.wet import wet_documents_stream
from hive_serde_schema_gen_spark.streaming.ingest import (
    read_ingested,
    start_ingest_dedup,
)

BASE = " ".join(f"base{i}" for i in range(12))
NOVEL1 = " ".join(f"n1w{i}" for i in range(12))
NOVEL2 = " ".join(f"n2w{i}" for i in range(12))
NEAR_BASE = BASE + " tail"  # near-dup of the indexed base doc
NEAR_NOVEL1 = NOVEL1 + " tail"  # near-dup of a doc accepted in batch 1


def _wet_gz(path, recs):
    members = []
    for rid, text in recs:
        payload = text.encode()
        rec = (
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            + f"WARC-Target-URI: https://crawl.example/{rid}\r\n".encode()
            + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )
        members.append(gzip.compress(rec))
    with open(path, "wb") as f:
        f.write(b"".join(members))


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="wet_stream_")
    d = {n: os.path.join(root, n) for n in ("in", "index", "out", "chk")}
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_wet_ingest_end_to_end(spark, dirs):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)

    _wet_gz(
        os.path.join(dirs["in"], "crawl-000.warc.wet.gz"),
        [("r-near-base", NEAR_BASE), ("r-novel-1", NOVEL1)],
    )
    stream = wet_documents_stream(spark, dirs["in"]).select("doc_id", "text", "source")
    q = start_ingest_dedup(
        stream, dirs["index"], dirs["out"], dirs["chk"],
        query_name="wet_ingest",
    )
    try:
        q.processAllAvailable()
        _wet_gz(
            os.path.join(dirs["in"], "crawl-001.warc.wet.gz"),
            [("r-near-novel1", NEAR_NOVEL1), ("r-novel-2", NOVEL2)],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    texts = sorted(r["text"] for r in read_ingested(spark, dirs["out"]).collect())
    # novel docs accepted; near-dups of the base corpus AND of batch-1
    # acceptances rejected
    assert texts == sorted([NOVEL1, NOVEL2])
    # the documents projection rode through: source is the canonical host
    srcs = {r["source"] for r in read_ingested(spark, dirs["out"]).collect()}
    assert srcs == {"crawl.example"}


def test_streaming_warc_responses(spark, tmp_path):
    """read_warc_responses_stream: raw .warc.gz files landing in a dir
    become micro-batches of fetched html pages."""
    import gzip
    import os

    from hive_serde_schema_gen_spark.sources.wet import (
        read_warc_responses_stream,
    )

    indir = tmp_path / "in"
    os.makedirs(indir)
    body = b"<html><body><p>streamed page</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://s.org/p\r\n"
        b"WARC-Record-ID: <urn:uuid:ws-1>\r\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    (indir / "c-000.warc.gz").write_bytes(gzip.compress(rec))
    q = (
        read_warc_responses_stream(spark, str(indir))
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM warc_stream_t").collect()
    assert len(rows) == 1
    assert rows[0]["warc_record_id"] == "<urn:uuid:ws-1>"
    assert "streamed page" in rows[0]["text"]
