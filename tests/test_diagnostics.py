"""Skew report + parquet compaction: correct hot-key math, distributed
top-k plan, file-count targets, and clustering restoration."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.diagnostics import skew_report
from hive_serde_schema_gen_spark.sources.sinks import compact_parquet


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1: 600 rows; keys 2..101: 4 rows each → 1000 rows, 101 keys
    rows = [(1, i) for i in range(600)] + [
        (2 + (i % 100), i) for i in range(400)
    ]
    return spark.createDataFrame(rows, "user_id int, x int")


def test_skew_report_math(skewed):
    rep = skew_report(skewed, "user_id", k=3, n_partitions=10).collect()
    assert [r["rank"] for r in rep] == [1, 2, 3]
    top = rep[0]
    assert top["key"] == "1" and top["count"] == 600
    assert top["share"] == pytest.approx(0.6)
    # mean per-key count = 1000/101; 600 / that ≈ 60.6 (distinct is HLL →
    # small relative tolerance)
    assert top["skew_factor"] == pytest.approx(600 * 101 / 1000, rel=0.05)
    # avg partition = 1000/10 = 100 rows → key 1 needs 6 sub-keys
    assert top["suggested_salt"] == 6
    assert rep[1]["suggested_salt"] == 1  # cold keys need none


def test_skew_report_multi_column(skewed):
    # 1000 distinct values → perfectly uniform baseline column
    d = skewed.withColumn(
        "flat",
        F.when(F.col("user_id") == 1, F.col("x")).otherwise(F.col("x") + 600),
    )
    rep = skew_report(d, ["user_id", "flat"], k=1, n_partitions=8).collect()
    by_col = {r["column"]: r for r in rep}
    assert by_col["user_id"]["skew_factor"] > 50
    assert by_col["flat"]["skew_factor"] == pytest.approx(1.0, rel=0.05)


def test_skew_report_distributed_topk_plan(skewed):
    rep = skew_report(skewed, "user_id", k=5)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # not a global single-part sort


def test_compact_parquet_hits_target(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(20000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).repartition(64).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 64
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
    )
    target_mb = 1  # force a small-but-plural file count
    n = compact_parquet(spark, src, dst, target_mb=target_mb)
    assert n == -(-total // (1024 * 1024))
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) == n < 64
    assert spark.read.parquet(dst).count() == 20000


def test_compact_restores_clustering(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    # append-shaped input: interleaved id ranges across many small files
    # (high-entropy pad so parquet can't compress the bytes away and the
    # compacted output spans multiple files at target_mb=1)
    spark.range(30000).selectExpr(
        "id", "repeat(md5(cast(id AS string)), 8) AS pad"
    ).repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_mb=1, sort_by=["id"])
    # output files must be RANGE-DISJOINT on id (footer min/max don't overlap)
    spans = []
    for f in glob.glob(os.path.join(dst, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("id")
        spans.append(
            (
                min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)),
                max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)),
            )
        )
    spans.sort()
    assert len(spans) > 1
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


# ---------------------------------------------------------------------------
# Frequent items (Misra-Gries summaries + exact verify)
# ---------------------------------------------------------------------------


def test_frequent_items_matches_exact_topk(spark):
    import random

    from hive_serde_schema_gen_spark.operators.diagnostics import frequent_items

    rng = random.Random(11)
    # zipf-ish: key i drawn proportionally to 1/(i+1)
    keys = [f"k{i}" for i in range(200)]
    weights = [1.0 / (i + 1) for i in range(200)]
    rows = [(rng.choices(keys, weights)[0],) for _ in range(20000)]
    d = spark.createDataFrame(rows, "v string").repartition(8)

    got = [(r["key"], r["count"]) for r in frequent_items(d, "v", k=10).collect()]
    exact = [
        (r["v"], r["n"])
        for r in d.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "v")
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_frequent_items_tiny_capacity_still_finds_dominant(spark):
    from hive_serde_schema_gen_spark.operators.diagnostics import frequent_items

    # one key = 50% of rows, the rest spread over 5000 distinct keys;
    # capacity 64 per partition is far below the distinct count but far
    # above N/freq for the dominant key
    rows = [("hot",) if i % 2 == 0 else (f"cold{i}",) for i in range(10000)]
    d = spark.createDataFrame(rows, "v string").repartition(8)
    got = frequent_items(d, "v", k=1, capacity=64).collect()
    assert got[0]["key"] == "hot" and got[0]["count"] == 5000


def test_frequent_items_plan_shape(spark):
    from hive_serde_schema_gen_spark.operators.diagnostics import frequent_items
    from hive_serde_schema_gen_spark.plans.explain import (
        assert_no_python_udf,
        explain_str,
    )

    d = spark.createDataFrame([("a",), ("b",), ("a",)], "v string")
    out = frequent_items(d, "v", k=2)
    plan = explain_str(out)
    assert "MapInPandas" in plan  # Arrow-batched summaries, by design
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert_no_python_udf(out)  # no row-at-a-time Python eval nodes


def test_frequent_items_nulls_ignored(spark):
    from hive_serde_schema_gen_spark.operators.diagnostics import frequent_items

    d = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), ("y",)], "v string"
    )
    got = [(r["key"], r["count"]) for r in frequent_items(d, "v", k=5).collect()]
    assert got == [("x", 2), ("y", 1)]


# ---------------------------------------------------------------------------
# Column profiling (one aggregate pass)
# ---------------------------------------------------------------------------


def test_column_profile_values(spark):
    from hive_serde_schema_gen_spark.operators.diagnostics import column_profile

    d = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, 20.0, "bbbb"), (3, None, None), (4, 40.0, "cc")],
        "id int, v double, s string",
    )
    prof = {p["column"]: p for p in column_profile(d)}
    assert prof["id"]["rows"] == 4 and prof["id"]["nulls"] == 0
    assert prof["id"]["min"] == 1.0 and prof["id"]["max"] == 4.0
    assert prof["v"]["nulls"] == 1 and prof["v"]["null_frac"] == 0.25
    assert prof["v"]["mean"] == pytest.approx(70 / 3)
    assert prof["v"]["measured"] == "value"
    # strings profile LENGTH
    assert prof["s"]["measured"] == "length"
    assert prof["s"]["min"] == 2.0 and prof["s"]["max"] == 4.0
    assert 2 <= prof["s"]["approx_distinct"] <= 4


def test_column_profile_single_pass_plan(spark):
    # the profile of N columns must be ONE aggregate job: assert by plan on
    # the same expression set column_profile builds
    d = spark.createDataFrame([(1, "x")], "a int, b string")
    agg = d.agg(
        F.count(F.lit(1)), F.approx_count_distinct("a"), F.percentile_approx("a", 0.5)
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") + plan.count("HashAggregate") >= 2


def test_column_profile_empty_frame(spark):
    from hive_serde_schema_gen_spark.operators.diagnostics import column_profile

    d = spark.createDataFrame([], "x int")
    p = column_profile(d)[0]
    assert p["rows"] == 0 and p["null_frac"] == 0.0


def test_column_profile_interval_column(spark):
    # regression: 'interval day to second' must NOT classify as numeric
    # (simpleString starts with 'int'); it profiles as length instead of
    # crashing on cast-to-double
    from hive_serde_schema_gen_spark.operators.diagnostics import column_profile

    d = spark.sql("SELECT 1 AS id, INTERVAL '1 02:03:04' DAY TO SECOND AS iv")
    prof = {p["column"]: p for p in column_profile(d)}
    assert prof["iv"]["measured"] == "length"
    assert prof["id"]["measured"] == "value"


def test_frequent_items_validity_signal(spark):
    """with_validity=True: a clearly-separated head must come back
    guaranteed=True; a flat distribution whose keys out-bound the
    candidate budget must drop the flag instead of silently returning a
    possibly-wrong ranking."""
    from hive_serde_schema_gen_spark.operators.diagnostics import frequent_items

    head = [("hot", ) for _ in range(500)] + [(f"k{i}",) for i in range(50)]
    d = spark.createDataFrame(head, "v string").repartition(4)
    rows = frequent_items(d, "v", k=1, with_validity=True).collect()
    assert rows[0]["key"] == "hot" and rows[0]["count"] == 500
    assert rows[0]["guaranteed"] is True

    # flat: 4000 distinct keys, tiny capacity => bound swamps the k-th count
    flat = spark.createDataFrame(
        [(f"k{i % 4000}",) for i in range(8000)], "v string"
    ).repartition(8)
    rows = frequent_items(
        flat, "v", k=5, capacity=16, candidate_multiple=2, with_validity=True
    ).collect()
    assert all(r["guaranteed"] is False for r in rows)


def test_diag_evidence_rows_invariants(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.diagnostics import (
        PROF_COLS,
        PROF_NULL_MOD,
        SKEW_COLS,
        SKEW_K,
        diag_evidence_rows,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    rows = diag_evidence_rows(spark, sf_dir).collect()
    skew = [r for r in rows if r["dop"] == "skew"]
    prof = [r for r in rows if r["dop"] == "prof"]
    assert len(prof) == len(PROF_COLS)
    # every accuracy-contract boolean must hold on the shipped corpus
    assert all(r["ok"] for r in rows)
    # planted nulls: exactly the doc_id % MOD == 0 docs, only on lang
    docs = load_table(spark, sf_dir, "documents")
    expected_nulls = docs.filter(f"doc_id % {PROF_NULL_MOD} = 0").count()
    by_col = {r["grp"]: r for r in prof}
    assert by_col["lang"]["bucket"] == expected_nulls
    assert by_col["doc_id"]["bucket"] == 0
    # per skew column: at most k rows, ranks contiguous from 1, counts
    # non-increasing in rank order
    for c in SKEW_COLS:
        mine = sorted(
            (r for r in skew if r["grp"].startswith(c + "|")),
            key=lambda r: r["bucket"],
        )
        assert 0 < len(mine) <= SKEW_K
        assert [r["bucket"] for r in mine] == list(range(1, len(mine) + 1))
        counts = [r["n"] for r in mine]
        assert counts == sorted(counts, reverse=True)
