"""Training-shard export (`sinks.write_training_shards`): one file per
shard, rows in training (order-hash) order with offsets equal to the
file's running token count, hash-stable membership across rewrites."""

from __future__ import annotations

import glob
import os

from hive_serde_schema_gen_spark.operators.packing import epoch_shuffle
from hive_serde_schema_gen_spark.sources.sinks import write_training_shards

ROWS = [(i, (i * 13) % 29 + 1) for i in range(200)]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, n_tokens long")


def test_one_sorted_file_per_shard_with_running_offsets(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        _df(spark), out, epoch=1, context_len=64, n_shards=4
    )
    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) == 4
    for sd in shard_dirs:
        files = [
            f for f in glob.glob(f"{sd}/*.parquet")
            if not os.path.basename(f).startswith(("_", "."))
        ]
        assert len(files) == 1  # one file per shard
        rows = spark.read.parquet(files[0]).collect()
        # file order IS training order: order_hash ascending, offsets run
        hashes = [r["order_hash"] for r in rows]
        assert hashes == sorted(hashes)
        run = 0
        for r in rows:
            assert r["offset"] == run
            run += r["n_tokens"]


def test_membership_matches_epoch_shuffle_and_rewrites_stable(
    spark, tmp_path
):
    out = str(tmp_path / "shards")
    write_training_shards(
        _df(spark), out, epoch=2, context_len=64, n_shards=3
    )
    got = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["shard"])
        for r in epoch_shuffle(_df(spark), epoch=2, n_shards=3).collect()
    }
    assert got == want
    write_training_shards(  # replay: byte-identical membership
        _df(spark), out, epoch=2, context_len=64, n_shards=3
    )
    again = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(out).collect()
    }
    assert again == got
