"""SemDeDup-style embedding-cluster dedup (`clustering.semdedup_prune` +
`assign_to_centroids` + `semdedup_novel`): keep-first pair rule, zero-vector
handling, frozen-centroid assignment stability, and the planted-evidence
construction (`semdedup_evidence_frame`) at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.clustering import (
    SD_EXACT_MOD,
    SD_EXACT_OFF,
    SD_EXACT_REM,
    SD_NOVEL_OFF,
    SD_THRESHOLD,
    assign_to_centroids,
    kmeans_topics,
    semdedup_evidence_frame,
    semdedup_novel,
    semdedup_prune,
)


def _edf(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def clustered(spark):
    """Two well-separated directions; ids 0/1 seed the two cells."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0
        (3, [1.0, 0.0, 0.0, 0.0]),     # exact dup of 0
        (4, [0.0, 0.0, 0.9, 0.1]),     # same cell as 1, below threshold? cos=0.9938
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector
        (6, [0.0, 1.0, 0.0, 0.0]),     # orthogonal to everything else
    ]
    e = _edf(spark, rows)
    cents, assigned = kmeans_topics(e, k=2, iters=1)
    return e, cents, assigned


def test_pair_rule_and_attribution(spark, clustered):
    e, _, assigned = clustered
    out = {
        r["vec_id"]: r
        for r in semdedup_prune(e, assigned, threshold=0.999).collect()
    }
    assert len(out) == 7
    # exact dup of 0 drops, attributed to the SMALLEST near-dup id (0)
    assert out[3]["dup_of"] == 0
    assert out[3]["dup_cos"] == pytest.approx(1.0, abs=1e-12)
    # near-dup 2 (cos ~0.9999995) also drops to 0 at threshold .999
    assert out[2]["dup_of"] == 0
    # the sources and everything below threshold stay kept
    for vid in (0, 1, 4, 6):
        assert out[vid]["dup_of"] is None, vid
    # zero vector: no cosine exists — always kept
    assert out[5]["dup_of"] is None


def test_zero_vectors_never_pair_even_together(spark):
    e = _edf(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),
            (2, [0.0, 0.0]),  # second zero vector, same cell as 1
        ],
    )
    cents, assigned = kmeans_topics(e, k=1, iters=1)
    out = semdedup_prune(e, assigned, threshold=0.5).collect()
    assert all(r["dup_of"] is None for r in out if r["vec_id"] in (1, 2))


def test_semdedup_novel_antijoin(spark, clustered):
    e, _, assigned = clustered
    pruned = semdedup_prune(e, assigned, threshold=0.999)
    kept = sorted(
        r["vec_id"] for r in semdedup_novel(e, pruned).collect()
    )
    assert kept == [0, 1, 4, 5, 6]


def test_frozen_assignment_matches_training(spark, clustered):
    """Re-assigning the training vectors against the frozen centroids
    reproduces the training assignment exactly (same metric, same
    tie-break) — the invariant the incremental path depends on."""
    e, cents, assigned = clustered
    train = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    frozen = {
        r["vec_id"]: r["cluster"]
        for r in assign_to_centroids(e, cents).collect()
    }
    assert frozen == train


def test_evidence_frame_families(spark, sf_dir):
    """The planted-batch expectations the slot hash pins, at sf0.001:
    every exact copy drops with dup_of = its source; reversed vectors
    and the whole base corpus stay kept."""
    e_count = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    cents_assigned = kmeans_topics(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=8, iters=2
    )
    out = semdedup_evidence_frame(
        spark, sf_dir, cents_assigned[0], cents_assigned[1]
    ).collect()
    rows = {r["vec_id"]: r for r in out}
    exacts = [
        v for v in rows if SD_EXACT_OFF <= v < 2 * SD_EXACT_OFF
    ]
    assert exacts, "no exact plants at this SF?"
    for v in exacts:
        src = v - SD_EXACT_OFF
        assert rows[v]["dup_of"] == src, v
        assert src % SD_EXACT_MOD == SD_EXACT_REM
        assert rows[v]["dup_cos"] >= SD_THRESHOLD
    for v in rows:
        if v < SD_EXACT_OFF:  # base corpus
            assert rows[v]["dup_of"] is None, v
        if v >= SD_NOVEL_OFF:  # reversed vectors are new content
            assert rows[v]["dup_of"] is None, v
    assert len(rows) == e_count + len(exacts) + sum(
        1 for v in rows if 2 * SD_EXACT_OFF <= v < SD_NOVEL_OFF
    ) + sum(1 for v in rows if v >= SD_NOVEL_OFF)
