"""Regression tests for the round-1 self-review findings (each was a
verified bug before its fix)."""

from decimal import Decimal

import pytest

from hive_serde_schema_gen_spark.schema_infer import (
    BadJson,
    Num,
    diff,
    infer_ndjson_strings,
    infer_path,
    render_definition,
)
from hive_serde_schema_gen_spark.schema_infer.lattice import describe, merge_lenient


def test_nan_infinity_rejected_as_bad_json():
    """json.loads admits NaN/Infinity by default; the lattice can't type
    them (Decimal('Infinity') breaks rendering) and play-json rejects them."""
    for lit in ("NaN", "Infinity", "-Infinity"):
        with pytest.raises(BadJson) as ei:
            infer_ndjson_strings(iter(['{"ok": 1}', '{"v": %s}' % lit]))
        assert ei.value.line == 2


def test_permissive_cross_partition_conflict_file_path(spark, tmp_path):
    """PERMISSIVE must not crash when the kind conflict only surfaces at
    the driver's cross-partition merge (partition boundaries are not
    semantics)."""
    p = tmp_path / "split_conflict.json"
    p.write_text('{"v": 1}\n{"v": "x"}\n')
    result = infer_path(spark, str(p), mode="PERMISSIVE", min_partitions=2)
    assert render_definition(result.schema) == "v TINYINT"
    assert result.lines == 2
    assert any("RowMismatch" in e.message for e in result.errors)


def test_num_hash_eq_contract():
    a = Num(10, 10, 1)
    b = Num(Decimal("10.0"), Decimal("10.0"), 1)
    assert a == b
    assert hash(a) == hash(b)


def test_merge_lenient_keeps_earlier_kind():
    a = describe({"v": 1, "w": "x"})
    b = describe({"v": "oops", "w": "xyz"})
    m = merge_lenient(a, b)
    assert render_definition(m) == "v TINYINT,\nw VARCHAR(3)"


def test_evolve_narrowing_is_not_widening():
    old = infer_ndjson_strings(iter(['{"s": "abcdefghij"}'])).schema  # VARCHAR(10)
    new = infer_ndjson_strings(iter(['{"s": "abc"}'])).schema  # VARCHAR(3)
    (change,) = [c for c in diff(old, new) if c.column == "s"]
    assert change.kind == "narrowed"
    from hive_serde_schema_gen_spark.schema_infer import alter_statements

    assert alter_statements("t", old, new) == []


def test_streaming_accumulator_survives_cross_batch_conflict(spark):
    from hive_serde_schema_gen_spark.schema_infer import infer_json_column
    from hive_serde_schema_gen_spark.streaming.infer_stream import (
        StreamingSchemaAccumulator,
    )

    acc = StreamingSchemaAccumulator(permissive=True)
    b1 = spark.createDataFrame([('{"a": 1}',)], ["props"])
    b2 = spark.createDataFrame([('{"a": "x"}',)], ["props"])
    acc.absorb(infer_json_column(b1, "props", permissive=True), 1)
    acc.absorb(infer_json_column(b2, "props", permissive=True), 1)
    assert acc.definition() == "a TINYINT"
    assert acc.rows == 2
