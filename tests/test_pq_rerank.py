"""Product-quantized ANN re-rank: recall parity with the full-vector
re-rank on the driver corpus, artifact-size measurement, and determinism."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.similarity import (
    ann_topk_lsh,
    ann_topk_lsh_pq,
    build_lsh_index,
    build_pq_index,
    pq_approx_scores,
    quantized,
)
from hive_serde_schema_gen_spark.sources.tables import load_table

N_CODES = 32  # small corpus -> small codebook; prod default is 256


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").localCheckpoint()


@pytest.fixture(scope="module")
def lsh_index(corpus):
    return build_lsh_index(corpus)


@pytest.fixture(scope="module")
def pq_index(corpus):
    return build_pq_index(corpus, n_codes=N_CODES)


def test_codes_shape_and_determinism(spark, corpus, pq_index):
    codebook, codes = pq_index
    rows = codes.collect()
    assert len(rows) == corpus.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < N_CODES for c in r["codes"])
    # rebuild -> identical codes (integer k-means, no RNG)
    _, codes2 = build_pq_index(corpus, n_codes=N_CODES)
    a = {r["vec_id"]: list(r["codes"]) for r in rows}
    b = {r["vec_id"]: list(r["codes"]) for r in codes2.collect()}
    assert a == b


def test_recall_parity_with_full_vector_rerank(spark, corpus, lsh_index, pq_index):
    """The PQ path must find (nearly) the same top-10 as the exact-re-rank
    LSH path over the same candidate set.  Exact parity isn't guaranteed —
    ADC ordering can push a true hit below the k×mult cut — but on this
    corpus the shortlist is wide enough that overlap stays high."""
    full = [r["vec_id"] for r in ann_topk_lsh(corpus, 10, index=lsh_index).collect()]
    pq = [
        r["vec_id"]
        for r in ann_topk_lsh_pq(
            corpus, 10, index=lsh_index, pq=pq_index
        ).collect()
    ]
    assert len(pq) == 10
    overlap = len(set(full) & set(pq))
    assert overlap >= 7, (overlap, full, pq)


def test_approx_scores_correlate_with_exact(spark, corpus, pq_index):
    """ADC approximation sanity: approximate cosine of a vector against
    ITSELF as the query should rank that vector at/near the top."""
    codebook, codes = pq_index
    probe = (
        corpus.filter(F.col("vec_id") == 7)
        .select(quantized("embedding").alias("q"))
        .collect()[0]
    )
    qvec = [int(x) for x in probe["q"]]
    top = (
        pq_approx_scores(codes, codebook, qvec)
        .orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(N_CODES // 2)
        .collect()
    )
    assert 7 in [r["vec_id"] for r in top]


def test_pq_artifact_is_much_smaller(spark, corpus, lsh_index, pq_index, tmp_path):
    _, codes = pq_index
    full_dir, pq_dir = str(tmp_path / "full"), str(tmp_path / "pq")
    lsh_index.select("vec_id", "q").write.parquet(full_dir)
    codes.select("vec_id", "codes").write.parquet(pq_dir)

    def nbytes(d):
        return sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(d, "*.parquet"))
        )

    full_b, pq_b = nbytes(full_dir), nbytes(pq_dir)
    # raw payload is 64 longs vs 8 small ints (~16x); parquet encoding eats
    # some of that, so assert a conservative 4x
    assert pq_b * 4 < full_b, (pq_b, full_b)


def test_no_python_eval_in_pq_plan(spark, corpus, lsh_index, pq_index):
    from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

    assert_no_python_udf(
        ann_topk_lsh_pq(corpus, 10, index=lsh_index, pq=pq_index)
    )


def test_zero_norm_vectors_never_poison_the_shortlist(spark):
    """A zero embedding (or all-zero assigned codes) yields 0/0 in ADC;
    Spark sorts NaN above every double, so without the guard junk rows
    would crowd the k x mult shortlist.  Guarded score is -1."""
    import math
    import random

    from hive_serde_schema_gen_spark.operators.similarity import (
        build_pq_index as _bpq,
    )

    rng = random.Random(3)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(64)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [float(x / n) for x in v]))
    rows.append((999, [0.0] * 64))  # the degenerate vector
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    codebook, codes = _bpq(e, n_codes=8)
    probe = rows[7][1]
    qvec = [round(x * 10000) for x in probe]
    scored = {
        r["vec_id"]: r["approx_cos"]
        for r in pq_approx_scores(codes, codebook, qvec).collect()
    }
    import math as m

    assert not any(m.isnan(v) for v in scored.values())
    # the zero vector's codes may or may not hit all-zero centroids with a
    # tiny codebook; what matters is that NO score is NaN and the full
    # pipeline still returns k well-ordered rows
    top = ann_topk_lsh_pq(e, 5, query_vec_id=7).collect()
    assert len(top) == 5
    assert all(not m.isnan(r["cos_sim"]) for r in top)
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_pq_recall_parity_with_full_vector_rerank(spark, corpus, pq_index):
    """IVF-PQ composition (round-8): over the same probed cells, the
    PQ-first-pass path must find (nearly) the same top-10 as the
    full-vector IVF re-rank, and both must return exactly k rows."""
    from hive_serde_schema_gen_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_pq,
        build_ivf_index,
    )

    ivf = build_ivf_index(corpus)
    full = [r["vec_id"] for r in ann_topk_ivf(corpus, 10, index=ivf).collect()]
    pq = [
        r["vec_id"]
        for r in ann_topk_ivf_pq(corpus, 10, index=ivf, pq=pq_index).collect()
    ]
    assert len(full) == 10 and len(pq) == 10
    overlap = len(set(full) & set(pq))
    assert overlap >= 7, (overlap, full, pq)
    # determinism: a second run returns the identical ranking
    pq2 = [
        r["vec_id"]
        for r in ann_topk_ivf_pq(corpus, 10, index=ivf, pq=pq_index).collect()
    ]
    assert pq == pq2
