"""Exactly-once foreachBatch sink: replay and crash-recovery semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.streaming.exactly_once import (
    idempotent_epoch_sink,
    read_committed,
)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_committed_epoch_replay_is_skipped(spark, out_dir):
    handler = idempotent_epoch_sink(out_dir)
    handler(_batch(spark, 0, 100), 0)
    # at-least-once replay of the SAME epoch (same id, same rows)
    handler(_batch(spark, 0, 100), 0)
    assert read_committed(spark, out_dir).count() == 100


def test_uncommitted_epoch_replay_overwrites(spark, out_dir):
    handler = idempotent_epoch_sink(out_dir)
    handler(_batch(spark, 0, 50), 7)
    # simulate a crash between data write and ledger commit
    os.remove(os.path.join(out_dir, "_ledger", "epoch-7"))
    handler(_batch(spark, 0, 50), 7)  # replay re-writes, does not append
    got = read_committed(spark, out_dir)
    assert got.count() == 50
    assert got.select(F.sum("v").alias("s")).collect()[0].s == sum(
        2 * i for i in range(50)
    )


def test_uncommitted_leftovers_invisible(spark, out_dir):
    handler = idempotent_epoch_sink(out_dir)
    handler(_batch(spark, 0, 10), 0)
    handler(_batch(spark, 10, 30), 1)
    os.remove(os.path.join(out_dir, "_ledger", "epoch-1"))  # crashed epoch
    assert read_committed(spark, out_dir).count() == 10


def test_end_to_end_stream(spark, sf_dir, out_dir):
    """Real streaming query → idempotent sink → committed rows equal the
    batch result; a replayed final epoch adds nothing."""
    from hive_serde_schema_gen_spark.streaming.windows import _stream_source_dir

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream_dir = _stream_source_dir(sf_dir)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .select("event_id", "user_id", "value")
    )
    handler = idempotent_epoch_sink(out_dir)
    q = stream.writeStream.outputMode("append").foreachBatch(handler).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    got = read_committed(spark, out_dir)
    assert got.count() == expected

    # at-least-once: re-deliver the last committed epoch verbatim
    ledger = os.path.join(out_dir, "_ledger")
    last = max(int(m.split("-", 1)[1]) for m in os.listdir(ledger))
    replay = spark.read.parquet(os.path.join(out_dir, f"epoch={last}"))
    handler(replay, last)
    assert read_committed(spark, out_dir).count() == expected
