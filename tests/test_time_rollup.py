"""Hypertable-style time rollup: every grain in one pass, each grain equal
to the straight per-level GROUP BY it replaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.advanced import time_rollup
from hive_serde_schema_gen_spark.plans.explain import explain_str
from hive_serde_schema_gen_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def rolled(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = time_rollup(
        e, "ts", {"n": F.count(F.lit(1)), "total_value": F.sum("value")}
    )
    return e, out.cache()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("depth", [1, 2, 3, 4])
def test_each_grain_matches_direct_group_by(spark, rolled, depth):
    e, out = rolled
    levels = ("year", "month", "day", "hour")[:depth]
    grain = levels[-1]
    exprs = {
        "year": F.year("ts"),
        "month": F.month("ts"),
        "day": F.dayofmonth("ts"),
        "hour": F.hour("ts"),
    }
    direct = e.groupBy(
        *[exprs[lv].alias(lv) for lv in levels]
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    got = out.filter(F.col("grain") == grain)
    cols = list(levels) + ["n", "total_value"]
    assert _rows(got, cols) == _rows(direct, cols)


def test_total_row(spark, rolled):
    e, out = rolled
    tot = out.filter(F.col("grain") == "total").collect()
    assert len(tot) == 1
    assert tot[0].n == e.count()
    assert all(tot[0][lv] is None for lv in ("year", "month", "day", "hour"))


def test_single_shuffle_single_aggregate_pass(spark, rolled):
    # fresh build with DIFFERENT aggregates — the shared fixture is cached,
    # and any plan-identical DataFrame gets substituted with an
    # InMemoryTableScan, hiding the aggregate pipeline being asserted
    e, _ = rolled
    out = time_rollup(e, "ts", {"n_events": F.count(F.lit(1))})
    import re

    plan = explain_str(out)
    # one Expand feeding one partial+final aggregate pair over ONE exchange —
    # not a union of per-level jobs.  The formatted plan prints every node
    # twice (tree line + "(n) Node" detail header); count the headers.
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
