"""Streaming quality gate: row-level quarantine, batch-level stop-the-line
routing, per-epoch reports, and replay idempotence."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.validation import (
    completeness,
    row_count,
    satisfies,
)
from hive_serde_schema_gen_spark.streaming.quality_gate import process_gated_batch

def _checks():
    # built lazily: Check metrics are Column objects and need a live session
    return [
        completeness("text", 0.8),
        satisfies("length(text) < 1000", 0.9),
        row_count(2),
    ]


PRED = "text IS NOT NULL AND length(text) > 0"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="qgate_")
    d = {n: os.path.join(root, n) for n in ("good", "quar", "rep")}
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_healthy_batch_splits_rows(spark, dirs):
    batch = spark.createDataFrame(
        [(1, "fine"), (2, "also fine"), (3, None), (4, "")],
        "doc_id int, text string",
    )
    results = process_gated_batch(
        batch, 0, _checks(), dirs["good"], dirs["quar"], dirs["rep"], row_predicate=PRED
    )
    assert all(r["passed"] for r in results)
    good = {r["doc_id"] for r in spark.read.parquet(f"{dirs['good']}/epoch=0").collect()}
    quar = {r["doc_id"] for r in spark.read.parquet(f"{dirs['quar']}/epoch=0").collect()}
    assert good == {1, 2} and quar == {3, 4}
    rep = spark.read.parquet(f"{dirs['rep']}/epoch=0").collect()
    assert len(rep) == len(results) and all(r["passed"] for r in rep)


def test_failing_batch_stops_the_line(spark, dirs):
    # only 1 row passes the predicate → row_count>=2 fails at batch level
    batch = spark.createDataFrame(
        [(1, "only survivor"), (2, None), (3, None)], "doc_id int, text string"
    )
    results = process_gated_batch(
        batch, 5, _checks(), dirs["good"], dirs["quar"], dirs["rep"], row_predicate=PRED
    )
    assert not all(r["passed"] for r in results)
    assert not os.path.exists(f"{dirs['good']}/epoch=5")
    quar = {r["doc_id"] for r in spark.read.parquet(f"{dirs['quar']}/epoch=5").collect()}
    assert quar == {1, 2, 3}  # the WHOLE batch, predicate-passers included
    rep = spark.read.parquet(f"{dirs['rep']}/epoch=5").collect()
    assert any(not r["passed"] for r in rep)


def test_replay_idempotent(spark, dirs):
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id int, text string"
    )
    for _ in range(2):
        process_gated_batch(
            batch, 9, _checks(), dirs["good"], dirs["quar"], dirs["rep"], row_predicate=PRED
        )
        good = spark.read.parquet(f"{dirs['good']}/epoch=9").collect()
        assert {r["doc_id"] for r in good} == {1, 2}


def test_empty_batch_still_reports(spark, dirs):
    empty = spark.createDataFrame([], "doc_id int, text string")
    results = process_gated_batch(
        empty, 3, _checks(), dirs["good"], dirs["quar"], dirs["rep"],
        row_predicate=PRED,
    )
    assert results == []
    rep = spark.read.parquet(f"{dirs['rep']}/epoch=3").collect()
    assert [r["check"] for r in rep] == ["__empty_batch"]
    assert rep[0]["passed"]


def test_good_path_is_cleanly_readable(spark, dirs):
    # reports live OUTSIDE good_path: a plain read of good_path must work
    batch = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id int, text string")
    process_gated_batch(
        batch, 0, _checks(), dirs["good"], dirs["quar"], dirs["rep"],
        row_predicate=PRED,
    )
    got = spark.read.option("basePath", dirs["good"]).parquet(
        f"{dirs['good']}/epoch=*"
    )
    assert got.count() == 2
    import glob
    assert not glob.glob(f"{dirs['good']}/reports*")


def test_anomaly_detector_consumes_gate_reports(spark, dirs):
    """Contract binding: metric_anomalies runs directly on the report
    table the gate writes (schema + semantics, not just a synthetic
    frame)."""
    from hive_serde_schema_gen_spark.operators.validation import (
        completeness,
        metric_anomalies,
    )

    # 8 healthy epochs with slight completeness wobble, then a shifted one
    for e in range(8):
        n_null = 1 if e % 2 == 0 else 0
        rows = [(i, None if i < n_null else f"text {i}") for i in range(100)]
        process_gated_batch(
            spark.createDataFrame(rows, "doc_id int, text string"),
            e,
            [completeness("text", 0.5)],
            dirs["good"],
            dirs["quar"],
            dirs["rep"],
        )
    rows = [(i, None if i < 20 else f"text {i}") for i in range(100)]
    process_gated_batch(
        spark.createDataFrame(rows, "doc_id int, text string"),
        8,
        [completeness("text", 0.5)],
        dirs["good"],
        dirs["quar"],
        dirs["rep"],
    )
    reports = spark.read.option("basePath", dirs["rep"]).parquet(
        f"{dirs['rep']}/epoch=*"
    )
    flagged = metric_anomalies(reports, k=3.0, min_history=5).collect()
    assert [(r["check"], r["epoch"]) for r in flagged] == [
        ("completeness(text)>=0.5", 8)
    ]
