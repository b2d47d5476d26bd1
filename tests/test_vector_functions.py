"""Unit coverage for the public vector-function surface
(``functions.vector``): the plain double-precision path an oracle-free
production query would use (the oracle-checked queries use the quantized
integer formulation instead — see operators/similarity.py)."""

import math

from hive_serde_schema_gen_spark.functions import cosine_similarity, dot, l2_norm


def test_vector_functions_values(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], ["a", "b"]
    )
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    assert row["d"] == 4.0
    assert row["na"] == 3.0
    assert math.isclose(row["cos"], 4.0 / (3.0 * math.sqrt(5.0)))


def test_vector_functions_fold_is_sequential(spark):
    """Per-row folds are left-to-right (deterministic per row regardless of
    partitioning) — the documented contract of the module."""
    vals = [0.1] * 10
    df = spark.createDataFrame([(vals,)], ["a"])
    got = df.select(dot("a", "a").alias("d")).collect()[0]["d"]
    acc = 0.0
    for v in vals:
        acc += v * v
    assert got == acc
