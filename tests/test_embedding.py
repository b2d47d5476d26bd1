"""Hashed text embeddings: determinism, normalization, similarity
structure, zero-vector edge, and composition with the embedding-space
operator stack (semantic dedup over DERIVED vectors)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.embedding import embed_text

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE + " quietly"
OTHER = (
    "completely different subject matter entirely about distributed query "
    "engines shuffling partitioned columnar data across executor nodes"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, "")],
        "doc_id long, text string",
    )


def _vecs(spark, **kw):
    return {
        r["doc_id"]: list(r["embedding"])
        for r in embed_text(_docs(spark), **kw).collect()
    }


def _cos(a, b):
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    if na == 0 or nb == 0:
        return 0.0
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def test_shape_normalization_and_determinism(spark):
    v1 = _vecs(spark)
    v2 = _vecs(spark)
    assert v1 == v2  # bit-identical across runs
    for doc_id, v in v1.items():
        assert len(v) == 64
        n = math.sqrt(sum(x * x for x in v))
        if doc_id == 4:
            assert n == 0.0  # empty text -> zero vector, not a crash
        else:
            assert n == pytest.approx(1.0, abs=1e-12)


def test_similarity_structure(spark):
    v = _vecs(spark)
    near = _cos(v[1], v[2])
    far = _cos(v[1], v[3])
    assert near > 0.9  # one appended token barely moves the vector
    assert near > far + 0.3  # unrelated text is clearly separated


def test_salt_changes_vectors_dim_respected(spark):
    a = _vecs(spark, dim=32)
    b = _vecs(spark, dim=32, salt="other-salt")
    assert len(a[1]) == 32
    assert a[1] != b[1]
    with pytest.raises(ValueError):
        embed_text(_docs(spark), dim=0)


def test_composes_with_semantic_dedup(spark):
    """End-to-end: derive embeddings for a corpus WITHOUT an embeddings
    table, run semantic_dedup over them — the planted paraphrase pair
    collapses to one canonical, the unrelated doc survives."""
    from hive_serde_schema_gen_spark.operators.similarity import semantic_dedup

    # drop the empty-text doc (it embeds to the ZERO vector — length 64
    # like every other row, so a size() filter would be a no-op)
    emb = embed_text(_docs(spark)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).filter("vec_id != 4")
    labeled = semantic_dedup(emb, threshold=0.9)
    rows = {r["vec_id"]: r["canonical_id"] for r in labeled.collect()}
    assert rows[1] == 1 and rows[2] == 1  # paraphrase pair -> one canonical
    assert rows[3] == 3
