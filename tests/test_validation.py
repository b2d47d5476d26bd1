"""Deequ-style validation: one aggregate pass for N checks, correct
metrics, single-job plan shape, and the expect() raise path."""

from __future__ import annotations

import pytest

from hive_serde_schema_gen_spark.operators.validation import (
    ValidationError,
    completeness,
    expect,
    in_range,
    matches_regex,
    row_count,
    satisfies,
    uniqueness,
    validate,
)


@pytest.fixture(scope="module")
def d(spark):
    rows = [
        (1, "a@x.com", 10.0),
        (2, "b@y.org", 20.0),
        (3, None, 30.0),
        (4, "not-an-email", -5.0),
        (4, "d@z.net", 40.0),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id int, email string, amount double")


def test_metrics_values(d):
    res = {
        r["name"]: r
        for r in validate(
            d,
            [
                completeness("email", 0.9),
                uniqueness("id", 1.0, approx=False),
                in_range("amount", 0, 100, 0.9),
                satisfies("amount > 0", 0.8),
                row_count(1),
                matches_regex("email", r"^[^@]+@[^@]+\.[a-z]+$", 0.9),
            ],
        )
    }
    assert res["completeness(email)>=0.9"]["metric"] == pytest.approx(0.8)
    assert not res["completeness(email)>=0.9"]["passed"]
    assert res["uniqueness(id)>=1.0"]["metric"] == pytest.approx(4 / 5)
    assert res["in_range(amount,[0,100])>=0.9"]["metric"] == pytest.approx(0.8)
    assert res["satisfies(amount > 0)>=0.8"]["metric"] == pytest.approx(0.8)
    assert res["satisfies(amount > 0)>=0.8"]["passed"]
    assert res["row_count>=1"]["passed"]
    # 3 of 4 non-null emails match
    assert res["matches_regex(email)>=0.9"]["metric"] == pytest.approx(0.75)


def test_empty_relation_edge_cases(spark):
    empty = spark.createDataFrame([], "id int, v double")
    res = {r["name"]: r for r in validate(empty, [row_count(1), in_range("v", 0, 1)])}
    assert not res["row_count>=1"]["passed"]
    assert res["in_range(v,[0,1])>=1.0"]["passed"]  # vacuously true


def test_null_metric_fails_not_crashes(spark):
    # avg over all-null column -> null metric must count as failed
    d = spark.createDataFrame([(None,), (None,)], "v double")
    res = validate(d, [completeness("v", 0.5)])
    assert res[0]["metric"] == 0.0 and not res[0]["passed"]


def test_single_pass_plan(d):
    """All checks compile into one aggregate — the physical plan has exactly
    one HashAggregate pair (partial+final) and no extra jobs."""
    import pyspark.sql.functions as F

    checks = [completeness("email"), in_range("amount", 0, 100), *row_count(1)]
    agg = d.agg(
        *[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") == 2  # partial + final, one pass


def test_expect_raises_with_failures(d):
    with pytest.raises(ValidationError, match="completeness"):
        expect(d, [completeness("email", 0.99), row_count(1)])
    # passing set returns results
    assert expect(d, [row_count(1)])[0]["passed"]


def test_metric_anomalies(spark):
    from hive_serde_schema_gen_spark.operators.validation import metric_anomalies

    # 20 stable epochs ~0.999, then a regime shift the threshold would pass
    rows = [(e, "completeness(text)", 0.999 + 0.0002 * (e % 3)) for e in range(20)]
    rows += [(20, "completeness(text)", 0.991)]
    # a second check that stays flat — never flagged
    rows += [(e, "row_count", 1000.0) for e in range(21)]
    d = spark.createDataFrame(rows, "epoch long, check string, metric double")
    got = metric_anomalies(d, k=3.0).collect()
    assert [(r["check"], r["epoch"]) for r in got] == [("completeness(text)", 20)]
    assert got[0]["z"] < -3
    # early epochs (insufficient history) and zero-variance checks: silent
    assert not [r for r in got if r["check"] == "row_count"]


def test_metric_anomalies_exact_int(spark):
    """exact_int mode: integer metric, trailing moments from windowed
    integer sums — flags match a numpy re-derivation bit-for-bit."""
    import math

    from hive_serde_schema_gen_spark.operators.validation import (
        metric_anomalies,
    )

    series = [100, 102, 99, 101, 100, 98, 103, 100, 101, 99, 160, 100]
    rows = [(e, "events", v) for e, v in enumerate(series)]
    # constant series: integer variance-positivity test keeps it silent
    rows += [(e, "flat", 50) for e in range(12)]
    d = spark.createDataFrame(rows, "epoch long, check string, metric long")
    got = metric_anomalies(
        d, k=3.0, min_history=5, window=100, exact_int=True
    ).collect()
    assert [(r["check"], r["epoch"]) for r in got] == [("events", 10)]
    hist = series[:10]
    s1, s2, n = sum(hist), sum(v * v for v in hist), len(hist)
    mean = float(s1) / n
    std = math.sqrt((float(s2) - float(s1) * float(s1) / n) / (n - 1))
    assert got[0]["trail_mean"] == mean
    assert got[0]["trail_std"] == std
    assert got[0]["z"] == (160 - mean) / std


def test_metric_anomalies_exact_int_large_metrics(spark):
    """Round 13: metrics ~1e8 per epoch — (Σx)² and n·Σx² overflow int64
    (1e8² × 100 epochs ≈ 1e18 × n), which used to wrap silently in the
    long-typed moments, flipping the positivity test.  The decimal(38,0)
    moments keep the math exact: the planted spike is flagged and the
    stable-but-huge series stays silent."""
    import math

    from hive_serde_schema_gen_spark.operators.validation import (
        metric_anomalies,
    )

    base = 300_000_000  # 3e8 rows/epoch: s1² ≈ 9e18·window² >> int64 max
    series = [base + d for d in (0, 7, -3, 5, -6, 2, -4, 8, 1, -5)]
    series.append(base + 4_000_000)  # the drifted epoch
    rows = [(e, "events", v) for e, v in enumerate(series)]
    # flat at 1e9 — variance positivity must hold it silent, not wrap
    rows += [(e, "flat", 10**9) for e in range(11)]
    d = spark.createDataFrame(rows, "epoch long, check string, metric long")
    got = metric_anomalies(
        d, k=3.0, min_history=5, window=100, exact_int=True
    ).collect()
    assert [(r["check"], r["epoch"]) for r in got] == [("events", 10)]
    hist = series[:10]
    s1, s2, n = sum(hist), sum(v * v for v in hist), len(hist)
    mean = float(s1) / n
    std = math.sqrt((float(s2) - float(s1) * float(s1) / n) / (n - 1))
    assert got[0]["trail_mean"] == mean
    assert got[0]["trail_std"] == std
    assert got[0]["z"] == (series[10] - mean) / std


def test_anomaly_evidence_frame_flags_planted_spikes(spark):
    """The slot fixture at sf0.01: every flagged epoch is a planted one
    (epoch % 37 == 11) with positive z."""
    from hive_serde_schema_gen_spark.operators.validation import (
        ANOM_SPIKE_MOD,
        ANOM_SPIKE_REM,
        anomaly_evidence_frame,
    )

    got = anomaly_evidence_frame(spark, "/root/testdata/sf0.01").collect()
    assert got, "no flagged epochs at sf0.01 — fixture broken"
    for r in got:
        assert r["epoch"] % ANOM_SPIKE_MOD == ANOM_SPIKE_REM, r
        assert r["z"] > 3.0, r
