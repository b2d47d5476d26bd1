"""Mergeable sketches: union-distinct across persisted artifacts, theta
overlap vs exact set algebra, merged quantiles vs exact percentiles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.sketches import (
    group_sketches,
    merged_quantiles,
    overlap_estimates,
    union_distinct,
)


@pytest.fixture(scope="module")
def sources(spark):
    # A: keys 0..999, B: 500..1499 (50% overlap with A), C: 2000..2099
    rows = (
        [("A", i, float(i % 100)) for i in range(1000)]
        + [("B", i, float(i % 100)) for i in range(500, 1500)]
        + [("C", i, float(i)) for i in range(2000, 2100)]
    )
    return spark.createDataFrame(rows, "source string, key long, v double")


def test_union_distinct_across_persisted_artifacts(spark, sources, tmp_path):
    p = str(tmp_path / "sk")
    group_sketches(sources, "source", "key", "v").write.parquet(p)
    # later session: merge from artifacts only — no rescan of `sources`
    sk = spark.read.parquet(p)
    est = union_distinct(sk)
    exact = sources.select("key").distinct().count()  # 2100
    assert est == pytest.approx(exact, rel=0.03)


def test_overlap_matrix_matches_exact(spark, sources):
    sk = group_sketches(sources, "source", "key")
    got = {
        (r["group_a"], r["group_b"]): r for r in overlap_estimates(sk).collect()
    }
    ab = got[("A", "B")]
    assert ab["inter"] == pytest.approx(500, rel=0.05)
    assert ab["union"] == pytest.approx(1500, rel=0.05)
    assert ab["jaccard"] == pytest.approx(1 / 3, rel=0.1)
    assert ab["contain_a_in_b"] == pytest.approx(0.5, rel=0.1)
    # disjoint pairs
    assert got[("A", "C")]["inter"] == pytest.approx(0, abs=1.0)
    assert got[("B", "C")]["jaccard"] == pytest.approx(0, abs=0.01)


def test_merged_quantiles(spark, sources):
    sk = group_sketches(sources, "source", "key", "v")
    p50, p99 = merged_quantiles(sk, [0.5, 0.99])
    # 2000 rows of v in [0,100) + 100 rows in [2000,2100): p50 ≈ 50
    assert 40 <= p50 <= 60
    assert p99 >= 1000  # the C tail dominates the 99th


def test_sketch_artifact_is_bounded(spark, sources):
    sk = group_sketches(sources, "source", "key", "v").collect()
    for r in sk:
        assert len(bytes(r["hll"])) < 64 * 1024
        assert len(bytes(r["theta"])) < 64 * 1024
        assert len(bytes(r["kll"])) < 64 * 1024


def test_sketch_evidence_rows_all_ok(spark):
    """The driver-evidence branch: every boolean must be TRUE (matching
    the oracle's literals) and the exact columns must equal independent
    recomputation."""
    from pyspark.sql import functions as F

    from hive_serde_schema_gen_spark.operators.sketches import (
        SKETCH_KEY_MOD,
        sketch_evidence_rows,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    rows = sketch_evidence_rows(spark, sf_dir).collect()
    assert all(r["ok"] for r in rows), [
        (r["sop"], r["grp"]) for r in rows if not r["ok"]
    ]
    d = load_table(spark, sf_dir, "documents")
    by_lang = {
        r["lang"]: (r["n"], r["nd"])
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.pmod("doc_id", F.lit(SKETCH_KEY_MOD))).alias("nd"),
        )
        .collect()
    }
    for r in rows:
        if r["sop"] == "sketch":
            assert (r["n"], r["exact_parts"]) == by_lang[r["grp"]]
    ops = {r["sop"] for r in rows}
    assert ops == {"sketch", "sketch_ov", "sketch_u", "sketch_q"}
