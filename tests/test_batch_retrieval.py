"""Batch retrieval (`operators/batch_retrieval.py`) vs the single-query
serve paths: per-query parity for the hybrid composition, exact ADC
parity on the semantic side, and plan contracts."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.batch_retrieval import (
    ann_topk_batch,
    bm25_topk_indexed_batch,
    hybrid_topk_text_batch,
    lsh_candidates_batch,
    pq_scores_batch,
)
from hive_serde_schema_gen_spark.operators.embedding import embed_text
from hive_serde_schema_gen_spark.operators.hybrid import hybrid_topk_text
from hive_serde_schema_gen_spark.operators.similarity import (
    build_lsh_index,
    build_pq_index,
    lsh_buckets,
    pq_approx_scores,
    quantized,
)
from hive_serde_schema_gen_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

DIM = 16

TOPICS = {
    "fs": "filesystem mount disk inode kernel driver block device",
    "db": "database index transaction commit rollback query planner",
    "ml": "gradient descent tensor layer activation training epoch",
}


def _corpus():
    rows = []
    i = 0
    for key, words in TOPICS.items():
        toks = words.split()
        for j in range(10):
            # rotate so docs within a topic share vocabulary but differ
            text = " ".join(toks[(j + t) % len(toks)] for t in range(6))
            rows.append((i, f"{text} {key}{j}"))
            i += 1
    return rows


QUERIES = [
    (0, "disk kernel driver"),
    (1, "transaction commit query"),
    (2, "gradient training layer"),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("bridx") / "text_index")
    build_text_index(docs, path)
    e = embed_text(docs, dim=DIM).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).localCheckpoint()
    lsh = build_lsh_index(e)
    pq = build_pq_index(e)
    return docs, path, e, lsh, pq


def test_bm25_batch_matches_single(spark, corpus):
    _, path, _, _, _ = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    batch = bm25_topk_indexed_batch(spark, path, qdf, k=5).collect()
    got = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    for qid, query in QUERIES:
        single = bm25_topk_indexed(spark, path, query, k=5).collect()
        want = [(i + 1, r["doc_id"]) for i, r in enumerate(single)]
        rows = sorted(got[qid])
        assert [(rk, d) for rk, d, _ in rows] == want, qid
        for (rk, d, sc), sr in zip(rows, single):
            assert sc == pytest.approx(sr["bm25"], abs=1e-8)


def test_adc_scores_exactly_match_single(spark, corpus):
    _, _, e, lsh, pq = corpus
    codebook, codes = pq
    # use corpus vector 3 as the probe query
    probe = e.filter(F.col("vec_id") == 3).select(
        quantized("embedding").alias("q")
    ).collect()[0]
    qvec = [int(x) for x in probe["q"]]
    cand_ids = e.select("vec_id")  # all docs as candidates
    single = {
        r["vec_id"]: r["approx_cos"]
        for r in pq_approx_scores(
            codes.join(cand_ids, "vec_id"), codebook, qvec
        ).collect()
    }
    qq = spark.createDataFrame([(0, qvec)], "qid long, q array<long>")
    cands = cand_ids.withColumn("qid", F.lit(0)).select("qid", "vec_id")
    batch = {
        r["vec_id"]: r["approx_cos"]
        for r in pq_scores_batch(cands, codes, codebook, qq).collect()
    }
    assert set(single) == set(batch)
    for v, s in single.items():
        assert batch[v] == s, v  # integer pipeline: EXACT equality


def test_candidates_match_single_ball(spark, corpus):
    _, _, e, lsh, _ = corpus
    from hive_serde_schema_gen_spark.operators.similarity import (
        _lsh_candidate_ids,
    )

    probe = lsh.filter(F.col("vec_id") == 7).collect()[0]
    single = {
        r["vec_id"]
        for r in _lsh_candidate_ids(lsh, probe, query_vec_id=-1).collect()
    }
    qb = lsh_buckets(
        e.filter(F.col("vec_id") == 7)
    ).withColumnRenamed("vec_id", "qid")
    batch = {
        r["vec_id"] for r in lsh_candidates_batch(lsh, qb).collect()
    }
    assert batch == single


def test_hybrid_batch_matches_single(spark, corpus):
    docs, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    batch = hybrid_topk_text_batch(
        spark, path, qdf, e, k=5, lsh_index=lsh, pq=pq
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["rrf"]))
    for qid, query in QUERIES:
        single = hybrid_topk_text(
            spark, path, query, e, k=5, lsh_index=lsh, pq=pq
        ).collect()
        want = [r["doc_id"] for r in single]
        rows = sorted(got[qid])
        assert [d for _, d, _ in rows] == want, qid
        for (_, _, rrf), sr in zip(rows, single):
            assert rrf == pytest.approx(sr["rrf"], abs=1e-9)


def test_plan_contracts(spark, corpus):
    _, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    out = hybrid_topk_text_batch(spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq)
    assert_no_python_udf(out)


def test_mine_hard_negatives(spark, corpus):
    from hive_serde_schema_gen_spark.operators.batch_retrieval import (
        mine_hard_negatives,
    )

    docs, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    # label each query's true top hit as the positive
    top = {
        (r["qid"], r["doc_id"])
        for r in hybrid_topk_text_batch(
            spark, path, qdf, e, k=1, lsh_index=lsh, pq=pq
        ).collect()
    }
    pos = spark.createDataFrame(sorted(top), "qid long, doc_id long")
    negs = mine_hard_negatives(
        spark, path, qdf, pos, e, n_negatives=3, lsh_index=lsh, pq=pq
    ).collect()
    by_q = {}
    for r in negs:
        by_q.setdefault(r["qid"], []).append((r["neg_rank"], r["doc_id"]))
        assert (r["qid"], r["doc_id"]) not in top  # positives excluded
    for qid, _ in QUERIES:
        ranks = sorted(rk for rk, _ in by_q[qid])
        assert ranks == [1, 2, 3]


def test_mine_hard_negatives_skip_top(spark, corpus):
    from hive_serde_schema_gen_spark.operators.batch_retrieval import (
        mine_hard_negatives,
    )

    docs, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES[:1], "qid long, query string")
    pos = spark.createDataFrame([], "qid long, doc_id long")
    all_n = mine_hard_negatives(
        spark, path, qdf, pos, e, n_negatives=5, lsh_index=lsh, pq=pq
    ).collect()
    skipped = mine_hard_negatives(
        spark, path, qdf, pos, e, n_negatives=3, skip_top=2,
        lsh_index=lsh, pq=pq,
    ).collect()
    want = [r["doc_id"] for r in sorted(all_n, key=lambda r: r["neg_rank"])][2:5]
    got = [r["doc_id"] for r in sorted(skipped, key=lambda r: r["neg_rank"])]
    assert got == want
    assert [r["neg_rank"] for r in sorted(skipped, key=lambda r: r["neg_rank"])] == [1, 2, 3]


def test_unseen_terms_fall_back_to_semantic(spark, corpus):
    _, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(
        [(0, "zzz qqq www")], "qid long, query string"
    )
    out = hybrid_topk_text_batch(
        spark, path, qdf, e, k=5, lsh_index=lsh, pq=pq
    ).collect()
    # no lexical hits exist for these terms; the fused list must still
    # carry the semantic side's ranks
    assert len(out) == 5
    assert all(r["qid"] == 0 for r in out)


def test_batch_mixed_empty_query_rows(spark, corpus):
    _, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(
        [(0, "disk kernel driver"), (1, "   ")], "qid long, query string"
    )
    out = hybrid_topk_text_batch(
        spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    # the real query serves normally; the whitespace query contributes
    # no terms and a zero embedding -- whatever it returns must not
    # disturb qid 0, and qid 0 matches the single-query path
    single = hybrid_topk_text(
        spark, path, "disk kernel driver", e, k=3, lsh_index=lsh, pq=pq
    ).collect()
    assert [r["doc_id"] for r in sorted(by_q[0], key=lambda r: r["rank"])] == [
        r["doc_id"] for r in single
    ]


def test_all_empty_batch_degrades_to_semantic(spark, corpus):
    """ADVICE r10 regression: a batch whose queries are ALL term-free must
    not abort the plan — the lexical side is empty, the semantic side
    still serves (on the zero-vector sentinel)."""
    _, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(
        [(0, "   "), (1, "")], "qid long, query string"
    )
    out = hybrid_topk_text_batch(
        spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq
    ).collect()
    assert {r["qid"] for r in out} <= {0, 1}  # served, not raised


def test_semi_join_pruning_parity_and_plan(spark, corpus):
    """Past the vocabulary threshold the postings prune must switch from a
    literal IN-list to a broadcast left-semi join: same rows, no giant
    In-list in the plan."""
    _, path, _, _, _ = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    base = sorted(
        map(tuple, bm25_topk_indexed_batch(spark, path, qdf, k=5).collect())
    )
    semi_df = bm25_topk_indexed_batch(
        spark, path, qdf, k=5, semi_join_threshold=1
    )
    assert sorted(map(tuple, semi_df.collect())) == base
    plan = semi_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_empty_corpus_dim_error_and_dim_param(spark, corpus):
    _, path, _, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES[:1], "qid long, query string")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        hybrid_topk_text_batch(spark, path, qdf, empty, k=3)
    # dim= skips the eager probe and must reproduce the inferred-dim rows
    _, _, e, lsh, pq = corpus
    a = hybrid_topk_text_batch(
        spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq
    ).collect()
    b = hybrid_topk_text_batch(
        spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq, dim=DIM
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mine_hard_negatives_precomputed_hits(spark, corpus):
    from hive_serde_schema_gen_spark.operators.batch_retrieval import (
        mine_hard_negatives,
    )

    docs, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    pos = spark.createDataFrame([], "qid long, doc_id long")
    hits = hybrid_topk_text_batch(
        spark, path, qdf, e, k=50, lsh_index=lsh, pq=pq
    ).localCheckpoint()
    via_hits = mine_hard_negatives(
        spark, path, qdf, pos, e, n_negatives=3, hits=hits
    ).collect()
    recomputed = mine_hard_negatives(
        spark, path, qdf, pos, e, n_negatives=3, lsh_index=lsh, pq=pq
    ).collect()
    assert sorted(map(tuple, via_hits)) == sorted(map(tuple, recomputed))


def test_duplicate_qid_raises(spark, corpus):
    """qid uniqueness is a validated contract, not a docstring: duplicate
    qids would conflate candidate pools in every per-qid window."""
    _, path, e, lsh, pq = corpus
    qdf = spark.createDataFrame(
        [(1, "disk kernel"), (1, "transaction commit")],
        "qid long, query string",
    )
    with pytest.raises(ValueError, match="duplicate or NULL qid"):
        bm25_topk_indexed_batch(spark, path, qdf, k=5)
    with pytest.raises(ValueError, match="duplicate or NULL qid"):
        hybrid_topk_text_batch(spark, path, qdf, e, k=3, lsh_index=lsh, pq=pq)
    # the all-term-free fallback must ALSO enforce the contract: the
    # uniqueness row rides the probe, which runs before the term-free check
    blank = spark.createDataFrame(
        [(2, "   "), (2, "")], "qid long, query string"
    )
    with pytest.raises(ValueError, match="duplicate or NULL qid"):
        hybrid_topk_text_batch(spark, path, blank, e, k=3, lsh_index=lsh, pq=pq)


def test_null_qid_raises(spark, corpus):
    _, path, _, _, _ = corpus
    qdf = spark.createDataFrame(
        [(None, "disk kernel"), (7, "transaction commit")],
        "qid long, query string",
    )
    with pytest.raises(ValueError, match="duplicate or NULL qid"):
        bm25_topk_indexed_batch(spark, path, qdf, k=5)
