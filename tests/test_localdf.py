"""local_rows_df (functions/localdf.py): the Arrow-LocalRelation small-
table builder must be value-identical to the stock list-based
createDataFrame for every row shape the operators pass."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from hive_serde_schema_gen_spark.functions.localdf import local_rows_df


def _both(spark, rows, schema):
    a = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()))
    b = sorted(map(tuple, local_rows_df(spark, rows, schema).collect()))
    return a, b


def test_int_long_string_double(spark):
    rows = [(1, 2**40, "a", 0.5), (-3, -(2**62), "", 1e-9)]
    a, b = _both(spark, rows, "i int, l long, s string, d double")
    assert a == b


def test_struct_type_schema(spark):
    schema = StructType(
        [StructField("id", LongType()), StructField("c", IntegerType())]
    )
    rows = [(10**12, 3), (0, -1)]
    a, b = _both(spark, rows, schema)
    assert a == b


def test_empty(spark):
    a, b = _both(spark, [], "x int")
    assert a == b == []


def test_local_relation_plan(spark):
    df = local_rows_df(spark, [(1, 2)], "a int, b int")
    plan = df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    assert plan == "LocalRelation"
