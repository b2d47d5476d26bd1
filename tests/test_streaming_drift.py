"""Streaming classifier-drift monitor (`streaming/drift.py`): per-epoch
report parity with the batch `score_drift_report`, replay idempotence,
empty-epoch zero rows, flag parity with `metric_anomalies`, and one real
file-stream drive."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.logreg import (
    CLF_BUCKETS,
    calibration_rows,
    classifier_fit_rows,
    classifier_score_calibrated,
    score_drift_report,
)
from hive_serde_schema_gen_spark.streaming.drift import (
    drift_flags,
    process_drift_batch,
)

EPOCH_DOCS = 60


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    w = classifier_fit_rows(spark, sf_dir).localCheckpoint()
    cal, _ = calibration_rows(spark, sf_dir, weights=w)
    return w, cal.localCheckpoint()


@pytest.fixture()
def rep_dir():
    root = tempfile.mkdtemp(prefix="sdrift_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _epoch_batches(spark, sf_dir, n_epochs):
    from hive_serde_schema_gen_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return [
        docs.filter(F.col("doc_id") % n_epochs == e).select(
            "doc_id", "text"
        )
        for e in range(n_epochs)
    ]


def _kw():
    return dict(n_buckets=CLF_BUCKETS, hash_fn="md5")


def test_report_parity_with_batch(spark, sf_dir, model, rep_dir):
    w, cal = model
    batches = _epoch_batches(spark, sf_dir, 4)
    for e, b in enumerate(batches):
        process_drift_batch(b, e, w, cal, rep_dir, **_kw())
    got = sorted(
        (r["check"], r["epoch"], r["metric"])
        for r in spark.read.parquet(rep_dir).collect()
    )
    # batch twin: the same docs with the same epoch assignment
    from hive_serde_schema_gen_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier_score_calibrated(
        docs, w, cal, n_buckets=CLF_BUCKETS, hash_fn="md5"
    ).withColumn("epoch", F.col("doc_id") % 4)
    want = sorted(
        (r["check"], r["epoch"], r["metric"])
        for r in score_drift_report(scored).collect()
    )
    assert got == want


def test_replay_idempotent_and_empty_epoch(spark, sf_dir, model, rep_dir):
    w, cal = model
    b = _epoch_batches(spark, sf_dir, 3)[0]
    process_drift_batch(b, 0, w, cal, rep_dir, **_kw())
    first = sorted(map(tuple, spark.read.parquet(rep_dir).collect()))
    process_drift_batch(b, 0, w, cal, rep_dir, **_kw())  # replay
    assert sorted(map(tuple, spark.read.parquet(rep_dir).collect())) == first

    empty = b.filter("doc_id < 0")
    process_drift_batch(empty, 1, w, cal, rep_dir, **_kw())
    zeros = spark.read.parquet(f"{rep_dir}/epoch=1").collect()
    assert len(zeros) == 11  # 10 bins + cal_sum
    assert all(r["metric"] == 0 for r in zeros)


def test_flags_match_batch_anomaly_scan(spark, sf_dir, model, rep_dir):
    """8 epochs, epoch 6 EMPTY (scored volume collapses): the streaming
    poll and the batch scan over the accumulated table flag the same
    rows — and the collapse IS flagged on the cal_sum series."""
    w, cal = model
    batches = _epoch_batches(spark, sf_dir, 8)
    for e, b in enumerate(batches):
        src = b.filter("doc_id < 0") if e == 6 else b
        process_drift_batch(src, e, w, cal, rep_dir, **_kw())
    flags = drift_flags(
        spark, rep_dir, k=3.0, min_history=3, window=5
    ).collect()
    from hive_serde_schema_gen_spark.operators.validation import (
        metric_anomalies,
    )

    table = spark.read.parquet(rep_dir).select(
        "check", F.col("epoch").cast("long").alias("epoch"), "metric"
    )
    want = metric_anomalies(
        table, k=3.0, min_history=3, window=5, exact_int=True
    ).collect()
    assert sorted(map(tuple, flags)) == sorted(map(tuple, want))
    assert any(r["check"] == "cal_sum" and r["epoch"] == 6 for r in flags)


def test_file_stream_end_to_end(spark, sf_dir, model, rep_dir, tmp_path):
    from hive_serde_schema_gen_spark.streaming.drift import (
        start_drift_monitor,
    )

    w, cal = model
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    batches = _epoch_batches(spark, sf_dir, 3)
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = start_drift_monitor(
        stream, w, cal, rep_dir, ckpt, **_kw()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    table = spark.read.parquet(rep_dir)
    # every processed epoch landed the full 11-row series
    per_epoch = (
        table.groupBy("epoch").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_epoch] == [11]
    assert table.count() == 33


def test_series_labels_are_the_single_source_of_truth(spark, sf_dir, model):
    """The synthesized empty-epoch series must equal the labels
    score_drift_report actually emits."""
    from hive_serde_schema_gen_spark.operators.logreg import (
        drift_series_labels,
    )

    w, cal = model
    b = _epoch_batches(spark, sf_dir, 2)[0]
    scored = classifier_score_calibrated(
        b, w, cal, n_buckets=CLF_BUCKETS, hash_fn="md5"
    ).withColumn("epoch", F.lit(0))
    emitted = {
        r["check"] for r in score_drift_report(scored).collect()
    }
    assert emitted == set(drift_series_labels())
