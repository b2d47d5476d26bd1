"""LSH-bucketed embedding near-dup pairs vs brute force on planted dupes.

The driver's embeddings corpus is measured-isotropic (max pairwise cosine
~0.51 at sf0.01 — ``similarity_pairs_threshold`` calibrates its threshold
to 0.40 for that reason), so a meaningful
recall test needs PLANTED near-duplicates: a deterministic synthetic corpus
of base vectors plus slightly-perturbed copies (cos ≈ 0.99).  The bucketed
operator must return exactly the brute-force pair set at the threshold.
"""

from __future__ import annotations

import math
import random

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
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
    """With max_bucket=1, every bucket with ≥2 members is hot, so the
    quadratic term is demonstrably bounded under BOTH policies: drop emits
    nothing; refine degrades to star edges — at most
    R_REFINE · memberships candidates, LINEAR in the corpus (a degenerate
    corpus cannot force an all-pairs join)."""
    from hive_serde_schema_gen_spark.operators.similarity import (
        N_TABLES,
        R_REFINE,
    )

    assert (
        cosine_near_dup_pairs(
            planted, 0.0, max_bucket=1, hot_policy="drop"
        ).count()
        == 0
    )
    n_vecs = planted.count()
    linear_bound = R_REFINE * N_TABLES * n_vecs
    quadratic = n_vecs * (n_vecs - 1) // 2
    got = cosine_near_dup_pairs(
        planted, 0.0, max_bucket=1, hot_policy="refine"
    ).count()
    assert got <= linear_bound < quadratic


# ---------------------------------------------------------------------------
# Hot-bucket fallback: one giant duplicate class (the boilerplate-mirror
# case the old drop policy silently lost)
# ---------------------------------------------------------------------------

N_CLASS = 24  # identical-vector class, far above the tiny cap below
MAX_BUCKET = 8


@pytest.fixture(scope="module")
def giant_class(spark):
    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(DIM)]
    nb = math.sqrt(sum(v * v for v in base))
    rows = []
    # the duplicate class: tiny perturbations of ONE vector (cos ≈ 0.999) —
    # every member lands in the same bucket in every table AND survives any
    # number of extra hyperplanes, forcing the star fallback
    for i in range(N_CLASS):
        v = [x + rng.gauss(0, 0.005) for x in base]
        n = math.sqrt(sum(y * y for y in v))
        rows.append((i, [float(y / n) for y in v]))
    # background vectors, mutually unrelated
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        n = math.sqrt(sum(y * y for y in v))
        rows.append((5000 + i, [float(y / n) for y in v]))
    del nb
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()


def _components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), set()).add(x)
    return list(comp.values())


def test_drop_policy_loses_the_giant_class(spark, giant_class):
    got = cosine_near_dup_pairs(
        giant_class, THRESHOLD, max_bucket=MAX_BUCKET, hot_policy="drop"
    ).collect()
    class_pairs = [
        r for r in got if r["vec_a"] < N_CLASS and r["vec_b"] < N_CLASS
    ]
    # the motivating failure: the duplicate class collides into the same
    # hot bucket in EVERY table, so dropping hot buckets loses it entirely
    assert class_pairs == []


def test_refine_policy_recovers_the_giant_class_as_one_component(
    spark, giant_class
):
    got = cosine_near_dup_pairs(
        giant_class, THRESHOLD, max_bucket=MAX_BUCKET, hot_policy="refine"
    ).collect()
    for r in got:
        assert r["cos_sim"] >= THRESHOLD and r["vec_a"] < r["vec_b"]
    comps = _components(
        [(r["vec_a"], r["vec_b"]) for r in got if r["vec_a"] < N_CLASS]
    )
    class_comps = [c for c in comps if any(x < N_CLASS for x in c)]
    assert len(class_comps) == 1
    assert {x for x in class_comps[0] if x < N_CLASS} == set(range(N_CLASS))


def test_refine_policy_still_exact_when_no_hot_buckets(spark, planted):
    # with the default generous cap nothing is hot: refine == drop == brute
    want = {
        (r["vec_a"], r["vec_b"]) for r in _brute_pairs(planted).collect()
    }
    got = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(
            planted, THRESHOLD, hot_policy="refine"
        ).collect()
    }
    assert got == want


def test_hot_bucket_diag_observability(spark, giant_class):
    from hive_serde_schema_gen_spark.operators.similarity import (
        near_dup_hot_bucket_diag,
    )

    d = {
        r["stage"]: (r["n_buckets"], r["n_rows"])
        for r in near_dup_hot_bucket_diag(
            giant_class, max_bucket=MAX_BUCKET
        ).collect()
    }
    assert set(d) == {"safe", "refined", "star"}
    # the identical-vector class cannot be split by extra hyperplanes: it
    # must surface as star buckets with ~N_CLASS members per table
    assert d["star"][0] >= 1
    assert d["star"][1] >= N_CLASS


# ---------------------------------------------------------------------------
# SemDeDup-shaped semantic dedup (pairs -> components -> canonical)
# ---------------------------------------------------------------------------


def test_semantic_dedup_groups_and_canonicals(spark, planted):
    from hive_serde_schema_gen_spark.operators.similarity import semantic_dedup

    out = {r["vec_id"]: r for r in semantic_dedup(planted, THRESHOLD).collect()}
    want_pairs = {
        (r["vec_a"], r["vec_b"]) for r in _brute_pairs(planted).collect()
    }
    comps = _components(want_pairs)
    assert len(out) == planted.count()
    # every brute-force component maps to one canonical = its min id
    for comp in comps:
        want_canon = min(comp)
        for v in comp:
            assert out[v]["canonical_id"] == want_canon
            assert out[v]["is_canonical"] == (v == want_canon)
    # vectors in no pair are their own canonical
    paired = {x for p in want_pairs for x in p}
    for v, r in out.items():
        if v not in paired:
            assert r["canonical_id"] == v and r["is_canonical"]


def test_semantic_dedup_survives_giant_class(spark, giant_class):
    from hive_serde_schema_gen_spark.operators.similarity import semantic_dedup

    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            giant_class, THRESHOLD, max_bucket=MAX_BUCKET
        ).collect()
    }
    # the whole duplicate class collapses to one canonical (min id 0)
    class_canons = {out[i]["canonical_id"] for i in range(N_CLASS)}
    assert class_canons == {0}
    assert sum(1 for i in range(N_CLASS) if out[i]["is_canonical"]) == 1
