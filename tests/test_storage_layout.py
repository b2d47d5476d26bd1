"""Layout report (small-file audit) and schema drift detection."""

from __future__ import annotations

import pytest

from hive_serde_schema_gen_spark.sources.layout import (
    FieldChange,
    layout_report,
    schema_diff,
    snapshot_schema_diff,
)


def test_layout_report_flags_small_files(spark, tmp_path):
    p = str(tmp_path / "frag")
    spark.range(5000).selectExpr(
        "id", "repeat(md5(cast(id AS string)), 4) AS pad"
    ).repartition(40).write.parquet(p)
    rep = layout_report(spark, p, target_mb=8)
    assert rep["n_files"] == 40
    assert rep["small_file_frac"] == 1.0  # every file far below 2 MB
    assert rep["needs_compaction"]
    assert rep["files_at_target"] == 1
    assert rep["p50_bytes"] <= rep["p95_bytes"] <= rep["total_bytes"]


def test_layout_report_healthy_after_compaction(spark, tmp_path):
    from hive_serde_schema_gen_spark.sources.sinks import compact_parquet

    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    # big enough that the compacted file lands ABOVE target/4
    spark.range(30000).selectExpr(
        "id", "repeat(md5(cast(id AS string)), 8) AS pad"
    ).repartition(40).write.parquet(src)
    compact_parquet(spark, src, dst, target_mb=1)
    rep = layout_report(spark, dst, target_mb=1)
    assert not rep["needs_compaction"]


def test_schema_diff_kinds(spark):
    old = spark.createDataFrame(
        [], "id int, name string, meta struct<a: int, b: string>, gone double"
    ).schema
    new = spark.createDataFrame(
        [], "id long, name string, meta struct<a: int, c: date>, fresh boolean"
    ).schema
    changes = {(c.field, c.kind): c for c in schema_diff(old, new)}
    assert ("id", "retyped") in changes
    assert changes[("id", "retyped")].before == "int"
    assert changes[("id", "retyped")].after == "bigint"
    assert ("gone", "removed") in changes
    assert ("fresh", "added") in changes
    assert ("meta.b", "removed") in changes
    assert ("meta.c", "added") in changes
    # the struct container itself also reports the retype
    assert ("meta", "retyped") in changes
    assert ("name", "retyped") not in changes and ("name", "added") not in changes


def test_snapshot_schema_diff(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).selectExpr("id", "cast(id AS string) AS v").write.parquet(a)
    spark.range(3).selectExpr("id", "cast(id AS double) AS v").write.parquet(b)
    changes = snapshot_schema_diff(spark, a, b)
    assert changes == [FieldChange("v", "retyped", "string", "double")]


def test_schema_diff_identical_is_empty(spark):
    s = spark.createDataFrame([], "x int, y string").schema
    assert schema_diff(s, s) == []
