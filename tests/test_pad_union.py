"""pad_union: the declared schema is binding — typed NULL fill, declared-
type casts on mapped columns, misnamed mappings fail fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.functions.union import pad_union

SCHEMA = [("tag", "string"), ("k", "bigint"), ("v", "double")]


def test_null_padding_and_order(spark):
    a = spark.createDataFrame([(1,)], "k int")
    b = spark.createDataFrame([(2.5,)], "v double")
    out = pad_union(
        SCHEMA,
        (a, {"tag": F.lit("a"), "k": "k"}),
        (b, {"tag": F.lit("b"), "v": "v"}),
    )
    assert out.columns == ["tag", "k", "v"]
    rows = {r["tag"]: r for r in out.collect()}
    assert rows["a"]["k"] == 1 and rows["a"]["v"] is None
    assert rows["b"]["k"] is None and rows["b"]["v"] == 2.5


def test_declared_types_are_binding(spark):
    # component supplies int where the schema declares bigint, and an int
    # where it declares double: both must come out as the DECLARED types
    a = spark.createDataFrame([(7, 3)], "k int, v int")
    out = pad_union(SCHEMA, (a, {"tag": F.lit("x"), "k": "k", "v": "v"}))
    dt = dict(out.dtypes)
    assert dt == {"tag": "string", "k": "bigint", "v": "double"}
    r = out.collect()[0]
    assert r["k"] == 7 and r["v"] == 3.0


def test_unknown_mapping_name_fails_fast(spark):
    a = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="outside the schema"):
        pad_union(SCHEMA, (a, {"k": "k", "typo_col": F.lit(0)}))
