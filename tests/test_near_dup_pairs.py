"""LSH-bucketed embedding near-dup pairs vs brute force on planted dupes.

The driver's embeddings corpus is measured-isotropic (no pairs above
cos 0.9 — ``similarity_pairs_threshold`` returns 0 rows), so a meaningful
recall test needs PLANTED near-duplicates: a deterministic synthetic corpus
of base vectors plus slightly-perturbed copies (cos ≈ 0.99).  The bucketed
operator must return exactly the brute-force pair set at the threshold.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.similarity import (
    cosine_near_dup_pairs,
    qdot,
    quantized,
)

N_BASE = 60
N_DUPS = 25
DIM = 64
THRESHOLD = 0.95


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(42)
    rows = []
    for i in range(N_BASE):
        rows.append((i, [rng.gauss(0, 1) for _ in range(DIM)]))
    # dup of base i gets id 1000+i: tiny perturbation keeps cos ≈ 0.99
    for i in range(N_DUPS):
        base = rows[i][1]
        rows.append(
            (1000 + i, [x + rng.gauss(0, 0.02) for x in base])
        )
    norm = [
        (vid, [float(x / math.sqrt(sum(v * v for v in vec))) for x in vec])
        for vid, vec in rows
    ]
    return spark.createDataFrame(
        norm, "vec_id long, embedding array<float>"
    ).localCheckpoint()


def _brute_pairs(planted):
    q = planted.select("vec_id", quantized("embedding").alias("q"))
    a, b = q.alias("a"), q.alias("b")
    dot = qdot(F.col("a.q"), F.col("b.q")).cast("double")
    na = qdot(F.col("a.q"), F.col("a.q")).cast("double")
    nb = qdot(F.col("b.q"), F.col("b.q")).cast("double")
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= THRESHOLD)
    )


def test_bucketed_pairs_equal_brute_force_on_planted_dupes(spark, planted):
    want = {
        (r["vec_a"], r["vec_b"]) for r in _brute_pairs(planted).collect()
    }
    got = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(planted, THRESHOLD).collect()
    }
    # every planted dup must be a brute-force pair (sanity on the fixture)
    assert len(want) >= N_DUPS
    assert got == want


def test_pairs_with_prebuilt_index_equal_inline(spark, planted):
    from hive_serde_schema_gen_spark.operators.similarity import build_lsh_index

    idx = build_lsh_index(planted)
    a = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(planted, THRESHOLD).collect()
    }
    b = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(planted, THRESHOLD, index=idx).collect()
    }
    assert a == b and len(a) >= N_DUPS


def test_bucketed_pairs_empty_on_isotropic_corpus(spark, sf_dir):
    """On the driver's isotropic corpus there are no ≥0.9 pairs — and the
    bucketed operator must agree (no false positives from bucket sharing:
    re-rank is exact)."""
    from hive_serde_schema_gen_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    assert cosine_near_dup_pairs(e, 0.9).count() == 0


def test_hot_bucket_guard_caps_pair_blowup(spark, planted):
    """With max_bucket=1, every bucket with ≥2 members is excluded, so no
    candidates survive — the guard demonstrably bounds the quadratic term
    (a degenerate corpus cannot force an all-pairs join)."""
    assert cosine_near_dup_pairs(planted, 0.0, max_bucket=1).count() == 0
