"""Continuous-ingest dedup: micro-batches probe the persisted index, novel
docs land in epoch dirs AND extend the index, duplicates (of the base
corpus, of earlier batches, and within one batch) never land."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.dedup_index import build_minhash_index
from hive_serde_schema_gen_spark.streaming.ingest import (
    read_ingested,
    start_ingest_dedup,
)

BASE = " ".join(f"base{i}" for i in range(12))
NEW1 = " ".join(f"n1w{i}" for i in range(12))
NEW2 = " ".join(f"n2w{i}" for i in range(12))
NEAR_BASE = BASE + " tail"  # near-dup of the indexed base doc


def _write(path, rows):
    ids, texts = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="ingest_dedup_")
    d = {
        n: os.path.join(root, n)
        for n in ("in", "index", "out", "chk")
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_ingest_dedup_end_to_end(spark, dirs):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["in"])
    )
    q = start_ingest_dedup(
        stream,
        dirs["index"],
        dirs["out"],
        dirs["chk"],
        query_name=f"ingest_{int(time.time() * 1000)}",
    )
    try:
        # batch 1: novel doc + exact copy of the indexed base + an
        # intra-batch exact duplicate pair
        _write(
            os.path.join(dirs["in"], "b1.parquet"),
            [(101, NEW1), (102, BASE), (103, NEW2), (104, NEW2)],
        )
        q.processAllAvailable()
        # batch 2: near-dup of base, exact copy of batch-1's NEW1 (only in
        # the index via the extend), and one genuinely novel doc
        _write(
            os.path.join(dirs["in"], "b2.parquet"),
            [(201, NEAR_BASE), (202, NEW1), (203, "fresh unseen words entirely")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"] for r in read_ingested(spark, dirs["out"]).collect()}
    assert got == {101, 103, 203}

    # the survivors are now all in the index: re-probing any of them flags
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        dedup_against_index,
    )

    probe = spark.createDataFrame(
        [(301, NEW2), (302, "fresh unseen words entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_id"], r["matched_doc_id"])
        for r in dedup_against_index(probe, dirs["index"]).collect()
    }
    assert pairs == {(301, 103), (302, 203)}


def test_full_replay_after_index_extend_is_idempotent(spark, dirs):
    """THE replay hazard: an epoch whose index extend already committed is
    re-processed (crash before the streaming checkpoint commit).  The
    replayed docs are now IN the index; without the batch-self match
    exclusion they'd all match themselves, ``novel`` would be empty, and
    the overwrite would erase the epoch's accepted docs.  Runs the actual
    batch processor twice — probe, write, extend included."""
    from hive_serde_schema_gen_spark.streaming.ingest import process_ingest_batch

    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)
    batch = spark.createDataFrame(
        # novel doc + dup-of-base + an intra-batch NEAR-dup pair (102/103)
        # — near-dups pass the probe together and both get indexed, so the
        # replay must not let 103 match 102 either
        [(101, NEW1), (100, BASE), (102, NEW2), (103, NEW2 + " tail")],
        "doc_id long, text string",
    )
    for _ in range(2):  # first run, then the replay
        process_ingest_batch(batch, 0, dirs["index"], dirs["out"])
        got = sorted(
            r["doc_id"] for r in read_ingested(spark, dirs["out"]).collect()
        )
        assert got == [101, 102, 103]


def test_manifest_backed_ingest_with_replay(spark, dirs):
    from hive_serde_schema_gen_spark.sources.manifest import ManifestTable
    from hive_serde_schema_gen_spark.streaming.ingest import (
        process_ingest_batch_manifest,
    )

    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)
    table = ManifestTable(spark, os.path.join(dirs["out"], "tbl"))

    b1 = spark.createDataFrame(
        [(101, NEW1), (102, BASE)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(201, NEW2), (202, NEW1)], "doc_id long, text string"
    )
    process_ingest_batch_manifest(b1, 0, dirs["index"], table)
    process_ingest_batch_manifest(b1, 0, dirs["index"], table)  # replay
    process_ingest_batch_manifest(b2, 1, dirs["index"], table)

    got = sorted(r["doc_id"] for r in table.read().collect())
    assert got == [101, 201]  # 102 dup-of-base, 202 dup-of-epoch-0's 101
    assert table.current_version() == 1  # replay added no version
    # epoch-0 snapshot time-travels
    assert sorted(r["doc_id"] for r in table.read(0).collect()) == [101]


def test_cross_epoch_redelivery_of_same_id_rejected(spark, dirs):
    """A doc accepted in epoch 0 is RE-SENT (same doc_id, same text) in a
    later epoch — the most common duplication pattern in real feeds.
    Pre-fix it matched its own index entry, the match was discarded as a
    batch-self match, and the duplicate was re-admitted and re-indexed.
    The epoch-attribution guard must reject it while leaving same-epoch
    replay (the previous test) intact — including when the re-sent text
    was REVISED (id collision, near-dup content)."""
    from hive_serde_schema_gen_spark.streaming.ingest import process_ingest_batch

    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)

    b1 = spark.createDataFrame([(101, NEW1)], "doc_id long, text string")
    process_ingest_batch(b1, 0, dirs["index"], dirs["out"])
    # epoch 1: exact re-delivery of id 101, revised re-delivery of the
    # BASE corpus id 1 (epoch None in the index), and one novel doc
    b2 = spark.createDataFrame(
        [(101, NEW1), (1, BASE + " revised"), (201, NEW2)],
        "doc_id long, text string",
    )
    process_ingest_batch(b2, 1, dirs["index"], dirs["out"])
    got = sorted(r["doc_id"] for r in read_ingested(spark, dirs["out"]).collect())
    assert got == [101, 201]
    # and the re-sent id was NOT re-indexed: a later near-dup of NEW1
    # still matches exactly one index entry per surviving doc
    b3 = spark.createDataFrame(
        [(301, NEW1 + " tail")], "doc_id long, text string"
    )
    process_ingest_batch(b3, 2, dirs["index"], dirs["out"])
    got = sorted(r["doc_id"] for r in read_ingested(spark, dirs["out"]).collect())
    assert got == [101, 201]  # 301 caught as near-dup of the single entry


def test_ingest_maintains_digest_sketch_across_replay(spark, dirs):
    """digest_sketch=True keeps the triage artifact current per epoch, and
    an epoch REPLAY leaves the triage reading unchanged (Theta set
    semantics) — the same idempotence contract as the index extend."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        recrawl_triage,
    )
    from hive_serde_schema_gen_spark.streaming.ingest import (
        process_ingest_batch,
    )

    docs = spark.createDataFrame(
        [(i, f"seed doc {i} alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    build_minhash_index(
        docs, dirs["index"] + "-tri", hash_fn="md5", digest_sketch=True
    )
    b1 = spark.createDataFrame(
        [(100 + i, f"novel epoch-one doc {i} zz yy xx ww") for i in range(10)],
        "doc_id long, text string",
    )
    process_ingest_batch(
        b1, 0, dirs["index"] + "-tri", dirs["out"] + "-tri",
        digest_sketch=True,
    )
    probe = docs.limit(5).unionAll(b1.limit(5))  # 10/10 already ingested
    tri1 = recrawl_triage(probe, dirs["index"] + "-tri")
    assert tri1["seen"] == 10.0 and tri1["batch_distinct"] == 10.0
    # replay epoch 0: the index extend re-appends (tolerated) and the
    # sketch unions to the same set — triage reading unchanged
    process_ingest_batch(
        b1, 0, dirs["index"] + "-tri", dirs["out"] + "-tri",
        digest_sketch=True,
    )
    assert recrawl_triage(probe, dirs["index"] + "-tri") == tri1
