"""Streaming near-dup dedup: a late near-dup (and an exact copy) arriving
within the watermark are suppressed; band-key math is parity-checked
against the batch MinHash pipeline so the two paths cannot drift."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup import (
    BAND_SIZE,
    N_HASHES,
    minhash_signatures,
    shingles_df,
)
from hive_serde_schema_gen_spark.streaming.dedup import (
    minhash_band_keys,
    streaming_dedup_exact,
    streaming_near_dup_flags,
)

A = " ".join(f"w{i}" for i in range(20))
B = " ".join(f"b{i}" for i in range(15))
NEAR_DUP_A = A + " extra"  # shares 3/4 band keys with A (deterministic)
C = " ".join(f"c{i}" for i in range(18))

T0 = 1767225600_000_000  # 2026-01-01 00:00:00 UTC in microseconds
MIN = 60_000_000


def _write(path, rows):
    ids, tss, texts = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "ts": pa.array(list(tss), pa.timestamp("us", tz="UTC")),
                "text": pa.array(texts, pa.string()),
            }
        ),
        path,
    )


@pytest.fixture()
def doc_stream_dir():
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drive(spark, doc_stream_dir, build_query, name):
    """Start the query, feed three files in separate micro-batches (arrival
    order is the dedup tiebreak), then a far-future sentinel to close every
    window, and return the memory-sink rows for real docs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_stream_dir)
    )
    q = (
        build_query(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        _write(
            os.path.join(doc_stream_dir, "f1.parquet"),
            [(1, T0, A), (2, T0 + 1 * MIN, B)],
        )
        q.processAllAvailable()
        _write(
            os.path.join(doc_stream_dir, "f2.parquet"),
            [
                (3, T0 + 3 * MIN, NEAR_DUP_A),  # late near-dup of doc 1
                (4, T0 + 4 * MIN, C),  # genuinely novel
                (5, T0 + 5 * MIN, A),  # late exact copy of doc 1
                (6, T0 + 6 * MIN, None),  # metadata-only rows: no content
                (7, T0 + 7 * MIN, None),  # to judge -> BOTH must pass
            ],
        )
        q.processAllAvailable()
        # sentinel advances the watermark past every real window
        _write(
            os.path.join(doc_stream_dir, "sentinel.parquet"),
            [(999, T0 + 10**15, "s0 s1 s2 s3 sentinel")],
        )
        q.processAllAvailable()
        for _ in range(200):
            wm = (q.lastProgress or {}).get("eventTime", {}).get("watermark", "")
            if wm >= "2050":
                break
            time.sleep(0.1)
        else:
            raise TimeoutError("watermark never crossed the sentinel region")
        q.processAllAvailable()
    finally:
        q.stop()
    return [
        r
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r["doc_id"] < 900
    ]


def test_streaming_near_dup_suppression(spark, doc_stream_dir):
    name = f"sdup_{int(time.time() * 1000)}"
    rows = _drive(
        spark, doc_stream_dir, lambda s: streaming_near_dup_flags(s), name
    )
    flags = {r["doc_id"]: (r["n_bands"], r["n_novel_bands"]) for r in rows}
    n_bands = N_HASHES // BAND_SIZE
    # originals and the novel doc claim every band
    assert flags[1] == (n_bands, n_bands)
    assert flags[2] == (n_bands, n_bands)
    assert flags[4] == (n_bands, n_bands)
    # the late near-dup collides on 3/4 bands -> suppressed (partial claim)
    assert flags[3] == (n_bands, 1)
    # the late exact copy claims nothing -> absent entirely
    assert 5 not in flags
    # null-text docs each get a per-doc band: both pass, neither suppressed
    assert flags[6] == (1, 1) and flags[7] == (1, 1)
    suppressed = {
        d for d, (nb, nn) in flags.items() if nn < nb
    } | ({1, 2, 3, 4, 5} - set(flags))
    assert suppressed == {3, 5}


def test_streaming_exact_dedup(spark, doc_stream_dir):
    name = f"sexact_{int(time.time() * 1000)}"
    rows = _drive(
        spark,
        doc_stream_dir,
        lambda s: streaming_dedup_exact(s, watermark="30 minutes"),
        name,
    )
    got = sorted(r["doc_id"] for r in rows)
    # doc 5 is a byte-identical copy of doc 1 within the watermark: dropped;
    # the near-dup doc 3 differs by a word, so EXACT dedup keeps it; the
    # two null-text docs both survive (per-doc digest, not a shared NULL)
    assert got == [1, 2, 3, 4, 6, 7]


def test_band_keys_match_batch_minhash(spark, sf_dir):
    """Per-row streaming band keys == band keys derived from the batch
    ``minhash_signatures(..., hash_fn='xxhash64')`` pipeline, doc by doc,
    on the real documents table."""
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingles_df(d), hash_fn="xxhash64")
    batch_bands = sigs.select(
        "doc_id",
        F.array(
            *[
                F.xxhash64(
                    F.lit(j),
                    *[
                        F.col(f"mh{j * BAND_SIZE + k}")
                        for k in range(BAND_SIZE)
                    ],
                )
                for j in range(N_HASHES // BAND_SIZE)
            ]
        ).alias("bands"),
    )
    stream_style = d.select(
        "doc_id", minhash_band_keys("text").alias("bands")
    )
    a = {r["doc_id"]: list(r["bands"]) for r in batch_bands.collect()}
    b = {r["doc_id"]: list(r["bands"]) for r in stream_style.collect()}
    # batch pipeline only emits docs with >= 1 shingle; compare that set
    assert a and all(b[k] == v for k, v in a.items())
