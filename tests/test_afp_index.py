"""Persisted AFP (audio fingerprint) index (`operators/afp_index.py`) +
streaming audio ingest (`streaming/audio_ingest.py`): build→probe parity
with the batch operator, extend/probe across batches, replay idempotence
(the ingest.py interleavings applied to audio), compaction, the
cross-family meta guard, and a real file-stream drive — the audio
edition of tests/test_phash_index.py."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.afp_index import (
    afp_against_index,
    build_afp_index,
    compact_afp_index,
    extend_afp_index,
    novel_clips,
)
from hive_serde_schema_gen_spark.operators.multimodal import (
    _wav_encode,
    audio_fingerprints,
    audio_near_dup_pairs,
)
from hive_serde_schema_gen_spark.streaming.audio_ingest import (
    process_audio_ingest_batch,
    read_ingested_audio,
    start_audio_ingest,
)


def _clip(i, text):
    return (i, _wav_encode(i, text))


CORPUS = [
    _clip(1, b"the first corpus audio clip body with words"),
    _clip(2, b"a second, different corpus audio clip body"),
    _clip(3, b"third body that is unlike the other clips!"),
    _clip(4, b"fourth and final base clip content here..."),
]
# exact copy of clip 2's samples (same (id, text) construction, new id),
# a near-dup (one byte changed), and novel clips
COPY_OF_2 = (102, _wav_encode(2, b"a second, different corpus audio clip body"))
NEAR_2 = (103, _wav_encode(2, b"a second, differant corpus audio clip body"))
NOVEL_A = _clip(105, b"completely new payload number five, audio..")
NOVEL_B = _clip(106, b"another brand new clip, number six, audio..")


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="afp_index_")
    d = {n: os.path.join(root, n) for n in ("in", "index", "out", "chk")}
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "aud_id long, payload binary")


def test_build_probe_matches_batch_operator(spark, dirs):
    corpus = _frame(spark, CORPUS)
    build_afp_index(audio_fingerprints(corpus), dirs["index"], n_files=2)
    batch = _frame(spark, [COPY_OF_2, NEAR_2, NOVEL_A])
    bf = audio_fingerprints(batch).localCheckpoint()
    got = {
        (r["aud_id"], r["matched_aud_id"], r["dist"])
        for r in afp_against_index(bf, dirs["index"]).collect()
    }
    both = audio_fingerprints(corpus.unionAll(batch)).localCheckpoint()
    want = {
        (b, a, d)
        for a, b, d in (
            (r["img_a"], r["img_b"], r["dist"])
            for r in audio_near_dup_pairs(both).collect()
        )
        if a <= 4 < b  # corpus × batch pairs only, batch id first
    }
    assert got == want
    assert (102, 2, 0) in got  # the exact copy
    novel = {
        r["aud_id"]
        for r in novel_clips(
            bf, afp_against_index(bf, dirs["index"])
        ).collect()
    }
    assert 105 in novel and 102 not in novel


def test_extend_then_probe_sees_new_history(spark, dirs):
    build_afp_index(
        audio_fingerprints(_frame(spark, CORPUS)), dirs["index"], n_files=2
    )
    extend_afp_index(
        audio_fingerprints(_frame(spark, [NOVEL_A])), dirs["index"], epoch=1
    )
    probe = audio_fingerprints(
        _frame(
            spark,
            [(205, _wav_encode(105, b"completely new payload number five, audio.."))],
        )
    )
    got = {
        (r["aud_id"], r["matched_aud_id"], r["dist"])
        for r in afp_against_index(probe, dirs["index"]).collect()
    }
    assert (205, 105, 0) in got


def test_cross_family_meta_guard(spark, dirs):
    """An IMAGE-built index probed as an audio index fails loudly on the
    grid pin (8 vs 65) — the shared-layout hazard the meta row exists
    for."""
    from hive_serde_schema_gen_spark.operators.multimodal import (
        _bmp_encode,
        image_hashes,
    )
    from hive_serde_schema_gen_spark.operators.phash_index import (
        build_phash_index,
    )

    imgs = spark.createDataFrame(
        [(1, _bmp_encode(1, b"an image body, not audio at all here"))],
        "img_id long, payload binary",
    )
    build_phash_index(image_hashes(imgs), dirs["index"], n_files=1)
    with pytest.raises(ValueError, match="rebuild the index"):
        afp_against_index(
            audio_fingerprints(_frame(spark, [NOVEL_A])), dirs["index"]
        )


def test_ingest_replay_idempotent(spark, dirs):
    build_afp_index(
        audio_fingerprints(_frame(spark, CORPUS)), dirs["index"], n_files=2
    )
    b0 = _frame(spark, [COPY_OF_2, NOVEL_A, NOVEL_B])
    process_audio_ingest_batch(b0, 0, dirs["index"], dirs["out"])
    first = {
        r["aud_id"] for r in read_ingested_audio(spark, dirs["out"]).collect()
    }
    # full replay of epoch 0 after its extend committed
    process_audio_ingest_batch(b0, 0, dirs["index"], dirs["out"])
    again = {
        r["aud_id"] for r in read_ingested_audio(spark, dirs["out"]).collect()
    }
    assert first == again == {105, 106}
    # cross-epoch re-delivery of an accepted id: rejected outright
    b1 = _frame(
        spark,
        [NOVEL_A, _clip(301, b"novel in epoch one, a new audio payload")],
    )
    process_audio_ingest_batch(b1, 1, dirs["index"], dirs["out"])
    final = {
        r["aud_id"] for r in read_ingested_audio(spark, dirs["out"]).collect()
    }
    assert final == {105, 106, 301}


def test_compaction_preserves_probe_results(spark, dirs):
    build_afp_index(
        audio_fingerprints(_frame(spark, CORPUS)), dirs["index"], n_files=2
    )
    ext = audio_fingerprints(_frame(spark, [NOVEL_A]))
    extend_afp_index(ext, dirs["index"], epoch=1)
    extend_afp_index(ext, dirs["index"], epoch=1)  # replayed append
    probe = audio_fingerprints(_frame(spark, [COPY_OF_2, NOVEL_B]))
    before = {
        (r["aud_id"], r["matched_aud_id"], r["dist"])
        for r in afp_against_index(probe, dirs["index"]).collect()
    }
    n_before = spark.read.parquet(f"{dirs['index']}/hashes").count()
    compact_afp_index(spark, dirs["index"], n_files=2)
    after = {
        (r["aud_id"], r["matched_aud_id"], r["dist"])
        for r in afp_against_index(probe, dirs["index"]).collect()
    }
    n_after = spark.read.parquet(f"{dirs['index']}/hashes").count()
    assert before == after
    assert n_after == n_before - 1  # the replayed duplicate row reclaimed


def test_real_stream_drive(spark, dirs):
    build_afp_index(
        audio_fingerprints(_frame(spark, CORPUS)), dirs["index"], n_files=2
    )

    def _write(name, rows):
        ids, pays = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "aud_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(list(pays), pa.binary()),
                }
            ),
            os.path.join(dirs["in"], name),
        )

    stream = (
        spark.readStream.schema("aud_id long, payload binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["in"])
    )
    q = start_audio_ingest(
        stream,
        dirs["index"],
        dirs["out"],
        dirs["chk"],
        query_name=f"aud_ingest_{int(time.time() * 1000)}",
    )
    try:
        _write("b0.parquet", [COPY_OF_2, NOVEL_A])
        q.processAllAvailable()
        _write("b1.parquet", [NOVEL_A, NOVEL_B])  # re-delivery + novel
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["aud_id"] for r in read_ingested_audio(spark, dirs["out"]).collect()
    }
    assert got == {105, 106}