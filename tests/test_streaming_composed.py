"""The composed curation stream (`streaming/composed.py`): ingest dedup
→ frozen-model drift → validation-gated sink driven as ONE chain — a
real file-stream drive, crash-between-epochs restarts (the VERDICT r13
ask: kill the query between epochs, end state must equal the
uninterrupted run), mid-chain replay idempotence, and quarantine
isolation of the index."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup_index import (
    build_minhash_index,
)
from hive_serde_schema_gen_spark.operators.logreg import (
    CLF_BUCKETS,
    calibration_rows,
    classifier_fit_rows,
)
from hive_serde_schema_gen_spark.operators.validation import row_count
from hive_serde_schema_gen_spark.streaming.composed import (
    process_curated_ingest_batch,
    start_curated_ingest,
)

BASE = " ".join(f"base{i}" for i in range(12))
EPOCHS = [
    # (doc_id, text): novel docs, a dup of the indexed base, an
    # intra-batch dup pair, and a cross-epoch re-send of epoch-0's 103
    [(101, " ".join(f"e0w{i}" for i in range(12))), (102, BASE),
     (103, " ".join(f"e0x{i}" for i in range(12)))],
    [(201, " ".join(f"e1w{i}" for i in range(12))),
     (202, " ".join(f"e0x{i}" for i in range(12)))],
    [(301, " ".join(f"e2w{i}" for i in range(12))), (302, BASE),
     (303, " ".join(f"e2w{i}" for i in range(12)) + " tail")],
]


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    w = classifier_fit_rows(spark, sf_dir).localCheckpoint()
    cal, _ = calibration_rows(spark, sf_dir, weights=w)
    return w, cal.localCheckpoint()


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="composed_")
    d = {
        n: os.path.join(root, n)
        for n in ("in", "index", "good", "quar", "gater", "driftr", "chk")
    }
    os.makedirs(d["in"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _kw(dirs, model):
    w, cal = model
    return dict(
        index_path=dirs["index"],
        good_path=dirs["good"],
        quarantine_path=dirs["quar"],
        gate_report_path=dirs["gater"],
        drift_report_path=dirs["driftr"],
        weights=w,
        cal_params=cal,
        checks=[*row_count(1)],
        score_kwargs=dict(n_buckets=CLF_BUCKETS, hash_fn="md5"),
    )


def _seed_index(spark, dirs):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    build_minhash_index(corpus, dirs["index"], n_files=2)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _state(spark, dirs):
    """The complete observable end state of the chain."""
    good = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.option("basePath", dirs["good"])
        .parquet(f"{dirs['good']}/epoch=*")
        .collect()
    )
    drift = sorted(
        (r["epoch"], r["check"], r["metric"])
        for r in spark.read.parquet(dirs["driftr"]).collect()
    )
    gate = sorted(
        (r["epoch"], r["check"], r["passed"])
        for r in spark.read.parquet(dirs["gater"]).collect()
    )
    sigs = sorted(
        {r["doc_id"] for r in
         spark.read.parquet(f"{dirs['index']}/sigs").collect()}
    )
    return good, drift, gate, sigs


def _run_plain(spark, dirs, model):
    for e, rows in enumerate(EPOCHS):
        process_curated_ingest_batch(
            _batch(spark, rows), e, **_kw(dirs, model)
        )


def test_uninterrupted_chain(spark, dirs, model):
    _seed_index(spark, dirs)
    _run_plain(spark, dirs, model)
    good, drift, gate, sigs = _state(spark, dirs)
    ids = {i for i, _ in good}
    # base dups (102, 302) rejected; cross-epoch re-send (202) rejected;
    # intra-batch near-dup pair (301/303) both admitted (probe can't see
    # them — documented contract) — everything else accepted
    assert ids == {101, 103, 201, 301, 303}
    assert sigs == [1, 101, 103, 201, 301, 303]
    # every epoch observed by both monitors
    assert {e for e, _, _ in drift} == {0, 1, 2}
    assert {e for e, _, _ in gate} == {0, 1, 2}


@pytest.mark.parametrize("replay_epoch", [0, 1, 2])
def test_full_epoch_replay_parity(spark, dirs, model, replay_epoch):
    """Crash AFTER an epoch fully committed (all four steps), before the
    streaming checkpoint recorded it: the epoch re-runs.  End state must
    equal the uninterrupted run — for every epoch position."""
    _seed_index(spark, dirs)
    for e, rows in enumerate(EPOCHS):
        process_curated_ingest_batch(
            _batch(spark, rows), e, **_kw(dirs, model)
        )
        if e == replay_epoch:  # the replay
            process_curated_ingest_batch(
                _batch(spark, rows), e, **_kw(dirs, model)
            )
    good, drift, gate, sigs = _state(spark, dirs)
    assert {i for i, _ in good} == {101, 103, 201, 301, 303}
    assert sigs == [1, 101, 103, 201, 301, 303]
    assert {e for e, _, _ in drift} == {0, 1, 2}


def test_mid_chain_crash_replay_parity(spark, dirs, model):
    """Crash INSIDE the chain — after drift + gate landed but before the
    index extend (the composed-specific interleaving: the building-block
    tests each cover their own step, not this cut point).  The replay
    re-probes with the epoch's docs absent from the index, recomputes the
    same novel set, overwrites the same epoch dirs, and extends."""
    _seed_index(spark, dirs)
    kw = _kw(dirs, model)
    b0 = _batch(spark, EPOCHS[0])
    # partial run: everything except the extend
    from hive_serde_schema_gen_spark.streaming.drift import (
        process_drift_batch,
    )
    from hive_serde_schema_gen_spark.streaming.ingest import (
        _novel_for_batch,
    )
    from hive_serde_schema_gen_spark.streaming.quality_gate import (
        process_gated_batch,
    )

    novel = _novel_for_batch(b0, dirs["index"], True, 0)
    process_drift_batch(
        novel, 0, kw["weights"], kw["cal_params"], dirs["driftr"],
        **kw["score_kwargs"],
    )
    process_gated_batch(
        novel, 0, kw["checks"], dirs["good"], dirs["quar"], dirs["gater"]
    )
    # crash here: no extend.  Replay epoch 0 fully, then run the rest.
    for e, rows in enumerate(EPOCHS):
        process_curated_ingest_batch(_batch(spark, rows), e, **kw)
    good, drift, gate, sigs = _state(spark, dirs)
    assert {i for i, _ in good} == {101, 103, 201, 301, 303}
    assert sigs == [1, 101, 103, 201, 301, 303]


def test_quarantined_epoch_does_not_poison_index(spark, dirs, model):
    """A batch the gate rejects must leave the index untouched, so the
    corrected re-send probes clean and is admitted."""
    _seed_index(spark, dirs)
    kw = _kw(dirs, model)
    kw["checks"] = [*row_count(5)]  # epoch 0's novel docs fail the floor
    bad = _batch(spark, EPOCHS[0])
    process_curated_ingest_batch(bad, 0, **kw)
    _, _, gate, sigs = _state_safe(spark, dirs)
    assert sigs == [1]  # nothing indexed
    assert not any(p for _, c, p in gate if c != "__empty_batch")
    # quarantine holds the whole NOVEL set (the gate runs after the
    # dedup probe: 102, a dup of the indexed base, never reaches it)
    q = spark.read.parquet(f"{dirs['quar']}/epoch=0")
    assert q.count() == 2
    # corrected re-send (same docs, later epoch, saner floor) admits
    kw["checks"] = [*row_count(1)]
    process_curated_ingest_batch(bad, 1, **kw)
    good = {
        r["doc_id"]
        for r in spark.read.option("basePath", dirs["good"])
        .parquet(f"{dirs['good']}/epoch=*")
        .collect()
    }
    assert good == {101, 102, 103} - {102}  # base dup still rejected


def _state_safe(spark, dirs):
    """_state minus the good-path read (absent when everything was
    quarantined)."""
    gate = sorted(
        (r["epoch"], r["check"], r["passed"])
        for r in spark.read.parquet(dirs["gater"]).collect()
    )
    sigs = sorted(
        {r["doc_id"] for r in
         spark.read.parquet(f"{dirs['index']}/sigs").collect()}
    )
    return None, None, gate, sigs


def test_real_stream_drive_with_kill_between_epochs(spark, dirs, model):
    """The actual StreamingQuery, killed between epochs and restarted
    from its checkpoint: end state equals the uninterrupted run's."""
    _seed_index(spark, dirs)
    stream_schema = "doc_id long, text string"

    def _write(name, rows):
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(dirs["in"], name),
        )

    def _start():
        stream = (
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(dirs["in"])
        )
        return start_curated_ingest(
            stream,
            dirs["chk"],
            query_name=f"composed_{int(time.time() * 1000)}",
            **_kw(dirs, model),
        )

    q = _start()
    try:
        _write("b0.parquet", EPOCHS[0])
        q.processAllAvailable()
    finally:
        q.stop()  # the kill
    q = _start()  # restart from checkpoint
    try:
        _write("b1.parquet", EPOCHS[1])
        _write("b2.parquet", EPOCHS[2])
        q.processAllAvailable()
    finally:
        q.stop()
    good, drift, gate, sigs = _state(spark, dirs)
    assert {i for i, _ in good} == {101, 103, 201, 301, 303}
    assert sigs == [1, 101, 103, 201, 301, 303]
    assert {e for e, _, _ in drift} == {e for e, _, _ in gate}
    assert len({e for e, _, _ in drift}) == 3


def test_empty_checks_predicate_only_still_extends_index(
    spark, dirs, model
):
    """checks=[] (predicate-only routing) means the gate accepts by
    definition — accepted rows MUST still extend the index (review r14:
    an empty results list was mistaken for a failed batch, leaving
    accepted docs unindexed and re-admittable)."""
    _seed_index(spark, dirs)
    kw = _kw(dirs, model)
    kw["checks"] = []
    process_curated_ingest_batch(_batch(spark, EPOCHS[0]), 0, **kw)
    sigs = sorted(
        {r["doc_id"] for r in
         spark.read.parquet(f"{dirs['index']}/sigs").collect()}
    )
    assert sigs == [1, 101, 103]
    # the re-sent content in a later epoch now probes as a duplicate
    process_curated_ingest_batch(_batch(spark, EPOCHS[1]), 1, **kw)
    good = {
        r["doc_id"]
        for r in spark.read.option("basePath", dirs["good"])
        .parquet(f"{dirs['good']}/epoch=*")
        .collect()
    }
    assert good == {101, 103, 201}  # 202 (re-send of 103's text) rejected
