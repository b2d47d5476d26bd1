"""SURVEY §5 oracle tests: (a) our inferred Spark schema must be
equal-or-tighter than ``spark.read.json``'s own inference, per column;
(b) data generated *from* an inferred schema re-infers at-or-below the
original in the lattice (round-trip)."""

import json
import os

from pyspark.sql import types as T

from hive_serde_schema_gen_spark.schema_infer import (
    describe,
    infer_path,
    merge,
    render_type,
    to_spark_schema,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
USERS = os.path.join(FIXTURES, "users.json")

# width ladder: smaller index = tighter type
_NUM_WIDTH = {
    T.ByteType: 0,
    T.ShortType: 1,
    T.IntegerType: 2,
    T.LongType: 3,
    T.FloatType: 4,
    T.DoubleType: 5,
    T.DecimalType: 6,
}


def _tighter_or_equal(ours: T.DataType, sparks: T.DataType) -> bool:
    if isinstance(ours, T.StructType) and isinstance(sparks, T.StructType):
        theirs = {f.name: f.dataType for f in sparks.fields}
        return all(
            f.name not in theirs or _tighter_or_equal(f.dataType, theirs[f.name])
            for f in ours.fields
        )
    if isinstance(ours, T.ArrayType) and isinstance(sparks, T.ArrayType):
        return _tighter_or_equal(ours.elementType, sparks.elementType)
    if isinstance(ours, (T.VarcharType,)) and isinstance(sparks, T.StringType):
        return True  # VARCHAR(n) ⊑ STRING
    if isinstance(ours, T.DecimalType) and isinstance(
        sparks, (T.FloatType, T.DoubleType, T.DecimalType)
    ):
        return True  # exact decimal is the no-loss (strictest) numeric
    if type(ours) in _NUM_WIDTH and type(sparks) in _NUM_WIDTH:
        return _NUM_WIDTH[type(ours)] <= _NUM_WIDTH[type(sparks)]
    if isinstance(ours, T.NullType):
        return True  # unknown ⊑ anything
    return ours == sparks


def test_tighter_than_spark_inference(spark):
    """Spark infers long/double/string; the lattice must never be wider."""
    ours = to_spark_schema(infer_path(spark, USERS).schema)
    sparks = spark.read.json(USERS).schema
    assert _tighter_or_equal(ours, sparks), (ours, sparks)
    # and strictly tighter somewhere: id is byte for us, long for Spark
    assert isinstance(ours["id"].dataType, T.ByteType)
    assert isinstance(sparks["id"].dataType, T.LongType)


def _sample_value(desc):
    """A value conforming to a descriptor (exemplar-style)."""
    from hive_serde_schema_gen_spark.schema_infer import Arr, Bool, Num, Str, Struct

    if isinstance(desc, Bool):
        return True
    if isinstance(desc, Str):
        return "x" * desc.max_len
    if isinstance(desc, Num):
        return desc.hi
    if isinstance(desc, Arr):
        inner = _sample_value(desc.element)
        return [] if inner is None else [inner]
    if isinstance(desc, Struct):
        return {k: _sample_value(v) for k, v in desc.fields.items()}
    return None  # Unknown


def test_roundtrip_reinfer_at_or_below(spark, tmp_path):
    """Generate rows from the users.json schema, re-infer, and check the
    re-inferred schema sits at-or-below the original in the lattice
    (merging it into the original must not widen the original)."""
    original = infer_path(spark, USERS).schema
    row = _sample_value(original)
    p = tmp_path / "regen.json"
    # Decimals serialize through float (exact for this fixture's values);
    # default=str would quote them into strings and break the round-trip
    p.write_text(json.dumps(row, default=float) + "\n")
    reinferred = infer_path(spark, str(p)).schema
    merged = merge(original, reinferred)
    assert render_type(merged) == render_type(original)


def test_roundtrip_single_value_idempotent():
    """describe(sample(describe(v))) never widens describe(v)."""
    v = {"a": 5, "s": "abc", "n": [1, 2, 3], "o": {"b": True}}
    d = describe(v)
    d2 = describe(_sample_value(d))
    assert render_type(merge(d, d2)) == render_type(d)
