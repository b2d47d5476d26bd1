"""kmeans_topics + cluster_balanced_sample (`operators/clustering.py`):
planted-blob separation, determinism, rebalancing direction, and plan
contracts."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.clustering import (
    cluster_balanced_sample,
    kmeans_topics,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf


def _blob(center, n, start_id, spread=0.01):
    # deterministic small perturbations around an axis-aligned center
    rows = []
    for i in range(n):
        vec = [c + spread * ((i * 7 + j) % 5 - 2) for j, c in enumerate(center)]
        rows.append((start_id + i, vec))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    a = _blob([1.0, 0.0, 0.0, 0.0], 30, 0)
    b = _blob([0.0, 1.0, 0.0, 0.0], 10, 100)
    return spark.createDataFrame(a + b, "vec_id long, embedding array<double>")


def test_planted_blobs_separate(spark, blobs):
    cents, assigned = kmeans_topics(blobs, k=2, iters=3)
    rows = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert len(rows) == 40
    a_clusters = {rows[i] for i in range(30)}
    b_clusters = {rows[100 + i] for i in range(10)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters
    assert set(cents) == {0, 1}


def test_assignments_deterministic_across_repartition(spark, blobs):
    _, a1 = kmeans_topics(blobs, k=2, iters=2)
    _, a2 = kmeans_topics(blobs.repartition(7), k=2, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_k_larger_than_corpus_raises(spark, blobs):
    with pytest.raises(ValueError):
        kmeans_topics(blobs, k=100)


def test_balanced_sample_flattens_skew(spark, blobs):
    docs = blobs.select(F.col("vec_id").alias("doc_id"), F.lit("x").alias("text"))
    _, assigned = kmeans_topics(blobs, k=2, iters=3)
    out = cluster_balanced_sample(docs, assigned, alpha=0.0)
    got = out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    by_cluster = {r["cluster"]: r["n"] for r in got}
    # alpha=0 targets equal shares: the big blob (30) must be thinned
    # toward the small blob's kept count; the small one is kept whole
    assert len(by_cluster) == 2
    hi, lo = max(by_cluster.values()), min(by_cluster.values())
    assert lo >= 8  # small cluster kept (hash threshold jitters a little)
    assert hi <= 18  # big cluster thinned well below its 30


def test_balanced_sample_reproducible(spark, blobs):
    docs = blobs.select(F.col("vec_id").alias("doc_id"), F.lit("x").alias("text"))
    _, assigned = kmeans_topics(blobs, k=2, iters=2)
    s1 = sorted(r["doc_id"] for r in cluster_balanced_sample(docs, assigned).collect())
    s2 = sorted(
        r["doc_id"]
        for r in cluster_balanced_sample(
            docs.repartition(5), assigned, alpha=0.5
        ).collect()
    )
    assert s1 == s2


def test_plan_contracts(spark, blobs):
    docs = blobs.select(F.col("vec_id").alias("doc_id"), F.lit("x").alias("text"))
    _, assigned = kmeans_topics(blobs, k=2, iters=1)
    assert_no_python_udf(assigned)
    out = cluster_balanced_sample(docs, assigned)
    assert_no_python_udf(out)


def test_curate_and_prepare_cluster_stage(spark):
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare

    sf_dir = "/root/testdata/sf0.001"
    base = curate_and_prepare(spark, sf_dir)
    rebal = curate_and_prepare(spark, sf_dir, cluster_alpha=0.0, cluster_k=4)
    n_base = base.count()
    n_rebal = rebal.count()
    # equal-share rebalancing over 4 clusters must drop rows from the
    # larger clusters; docs without an embeddings row pass through
    assert 0 < n_rebal < n_base


def test_cluster_stage_clamps_when_embeddings_sparse(spark):
    """docs= override whose ids are absent from the embeddings table:
    the documented contract is pass-through, not a kmeans ValueError."""
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    d = load_table(spark, sf_dir, "documents").withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    out = curate_and_prepare(
        spark, sf_dir, docs=d, cluster_alpha=0.5, cluster_k=16
    )
    assert out.count() > 0  # no embeddings matched -> stage skipped


def test_zero_vector_doc_does_not_capture_corpus(spark):
    """ADVICE r10 regression: an empty-text doc embeds to the zero vector;
    if it seeds a centroid, that cell's metric is 0/0 = NaN and Spark's
    struct-max would assign EVERY vector to the degenerate cell.  The
    seed set must skip zero vectors and the planted blobs must still
    separate."""
    a = _blob([1.0, 0.0, 0.0, 0.0], 10, 10)
    b = _blob([0.0, 1.0, 0.0, 0.0], 10, 100)
    zero = [(0, [0.0, 0.0, 0.0, 0.0])]  # lowest id -> would seed first
    e = spark.createDataFrame(
        zero + a + b, "vec_id long, embedding array<double>"
    )
    cents, assigned = kmeans_topics(e, k=2, iters=2)
    rows = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # no centroid is the zero vector
    assert all(any(c != 0 for c in vec) for vec in cents.values())
    # blobs separate instead of collapsing into one NaN-captured cell
    a_clusters = {rows[10 + i] for i in range(10)}
    b_clusters = {rows[100 + i] for i in range(10)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters
