"""Bucketed range join: equivalence to the naive theta-join and the
plan-shape guarantee (hash join, no nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.advanced import range_join_bucketed
from hive_serde_schema_gen_spark.plans.explain import explain_str
from hive_serde_schema_gen_spark.sources.tables import load_table

DAY = 86400


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t")
    ).limit(2000)


@pytest.fixture(scope="module")
def intervals(spark, sf_dir):
    # anchor intervals on real event times so point∈interval pairs exist
    # (orders' 1990s dates never overlap the events epoch)
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_id") % 50 == 0)
        .select(
            F.col("event_id").alias("o_orderkey"),
            "user_id",
            F.unix_timestamp("ts").alias("lo"),
            (F.unix_timestamp("ts") + 3 * DAY).alias("hi"),
        )
        .limit(500)
    )


def _key_set(rows):
    return sorted((r.event_id, r.o_orderkey) for r in rows)


def test_matches_naive_theta_join(spark, points, intervals):
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & F.col("p.t").between(F.col("i.lo"), F.col("i.hi")),
    )
    bucketed = range_join_bucketed(
        points, intervals, "t", "lo", "hi", bucket=7 * DAY, keys=("user_id",)
    )
    assert _key_set(bucketed.collect()) == _key_set(naive.collect())
    assert bucketed.count() > 0  # non-vacuous fixture


@pytest.mark.parametrize("bucket", [DAY, 30 * DAY, 365 * DAY])
def test_bucket_width_irrelevant_to_result(spark, points, intervals, bucket):
    got = range_join_bucketed(
        points, intervals, "t", "lo", "hi", bucket=bucket, keys=("user_id",)
    )
    ref = range_join_bucketed(
        points, intervals, "t", "lo", "hi", bucket=7 * DAY, keys=("user_id",)
    )
    assert _key_set(got.collect()) == _key_set(ref.collect())


def test_plans_as_hash_join_not_nested_loop(spark, points, intervals):
    bucketed = range_join_bucketed(
        points, intervals, "t", "lo", "hi", bucket=7 * DAY, keys=("user_id",)
    )
    plan = explain_str(bucketed)
    assert "HashJoin" in plan  # Broadcast- or SortMerge-/ShuffledHashJoin
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # the naive formulation really does degenerate without the bucket key —
    # the guard this operator exists for
    naive = points.alias("p").join(
        intervals.alias("i"), F.col("p.t").between(F.col("i.lo"), F.col("i.hi"))
    )
    assert "NestedLoop" in explain_str(naive) or "CartesianProduct" in explain_str(
        naive
    )


def test_no_duplicate_columns(spark, points, intervals):
    out = range_join_bucketed(
        points, intervals, "t", "lo", "hi", bucket=7 * DAY, keys=("user_id",)
    )
    assert sorted(out.columns) == sorted(
        ["event_id", "user_id", "t", "o_orderkey", "lo", "hi"]
    )
