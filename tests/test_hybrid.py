"""Hybrid retrieval (persisted BM25 index + LSH-PQ ANN + RRF): on a
planted keyword+paraphrase corpus the fused top-k must beat EITHER
single retriever's recall — keyword docs are invisible to the embedding
side (two shared tokens drown in filler), paraphrase docs are invisible
to BM25 (they contain none of the query terms)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.embedding import embed_text
from hive_serde_schema_gen_spark.operators.hybrid import hybrid_topk
from hive_serde_schema_gen_spark.operators.similarity import (
    ann_topk_lsh_pq,
    build_lsh_index,
    build_pq_index,
)
from hive_serde_schema_gen_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
)

QUERY_TERMS = "zyxwv qponm"  # rare terms, high idf
TOPIC = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)
QUERY_DOC_ID = 999
K = 6
RELEVANT = set(range(1, 7))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # keyword docs 1-3: carry the rare query terms, otherwise off-topic
    for i in range(1, 4):
        filler = " ".join(f"fill{i}w{j}" for j in range(20))
        rows.append((i, f"zyxwv qponm {filler}"))
    # paraphrase docs 4-6: topic overlap, NO query terms
    topic_words = TOPIC.split()
    for i in range(4, 7):
        rows.append((i, " ".join(topic_words[i - 4 :] + topic_words[: i - 4])))
    # decoys 7-30: unrelated vocabulary
    for i in range(7, 31):
        rows.append((i, " ".join(f"noise{i}t{j}" for j in range(20))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def artifacts(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hybrid-bm25"))
    build_text_index(corpus, path, n_files=2)
    qdoc = corpus.sparkSession.createDataFrame(
        [(QUERY_DOC_ID, f"{QUERY_TERMS} {TOPIC}")], "doc_id long, text string"
    )
    e = embed_text(corpus.unionByName(qdoc), dim=64, bigrams=True).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    lsh = build_lsh_index(e)
    pq = build_pq_index(e)
    return path, e, lsh, pq


def _recall(ids):
    return len(set(ids) & RELEVANT) / len(RELEVANT)


def test_hybrid_beats_single_retrievers(spark, artifacts):
    path, e, lsh, pq = artifacts
    lex_ids = [
        r["doc_id"]
        for r in bm25_topk_indexed(spark, path, QUERY_TERMS, k=K).collect()
    ]
    sem_ids = [
        r["vec_id"]
        for r in ann_topk_lsh_pq(
            e, k=K, query_vec_id=QUERY_DOC_ID, index=lsh, pq=pq
        ).collect()
    ]
    hyb_ids = [
        r["doc_id"]
        for r in hybrid_topk(
            spark, path, QUERY_TERMS, e,
            query_vec_id=QUERY_DOC_ID, k=K, lsh_index=lsh, pq=pq,
        ).collect()
    ]
    r_lex, r_sem, r_hyb = _recall(lex_ids), _recall(sem_ids), _recall(hyb_ids)
    # each single retriever sees only its half of the relevant set
    assert r_lex <= 0.5 and {1, 2, 3} <= set(lex_ids), (r_lex, lex_ids)
    assert r_sem <= 0.7 and {4, 5, 6} <= set(sem_ids), (r_sem, sem_ids)
    assert r_hyb == 1.0, (r_hyb, hyb_ids)
    assert r_hyb > max(r_lex, r_sem)
    # the query doc itself never leaks into the results
    assert QUERY_DOC_ID not in hyb_ids


def test_hybrid_is_deterministic(spark, artifacts):
    path, e, lsh, pq = artifacts
    runs = [
        [
            tuple(r)
            for r in hybrid_topk(
                spark, path, QUERY_TERMS, e,
                query_vec_id=QUERY_DOC_ID, k=K, lsh_index=lsh, pq=pq,
            ).collect()
        ]
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_free_text_query_matches_query_by_example(spark, artifacts):
    """hybrid_topk_text embeds the query string with the corpus's
    featurizer config and unions its buckets into the passed index — the
    result must equal query-by-example with the same text (the fixture's
    query doc IS this text), at O(query) serve cost (corpus artifacts
    reused, never rebuilt)."""
    from hive_serde_schema_gen_spark.operators.hybrid import (
        QUERY_TEXT_ID,
        hybrid_topk_text,
    )

    path, e, lsh, pq = artifacts
    corpus_e = e.filter(F.col("vec_id") != QUERY_DOC_ID)
    corpus_lsh = lsh.filter(F.col("vec_id") != QUERY_DOC_ID)
    got = [
        tuple(r)
        for r in hybrid_topk_text(
            spark, path, f"{QUERY_TERMS} {TOPIC}", corpus_e,
            k=K, lsh_index=corpus_lsh, pq=pq,
        ).collect()
    ]
    want = [
        tuple(r)
        for r in hybrid_topk(
            spark, path, f"{QUERY_TERMS} {TOPIC}", e,
            query_vec_id=QUERY_DOC_ID, k=K, lsh_index=lsh, pq=pq,
        ).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    # with the full sentence as the lexical query too, the paraphrase docs
    # also score lexically and fusion ties shuffle the tail — recall stays
    # high but the exact-set guarantee belongs to the two-list fixture of
    # test_hybrid_beats_single_retrievers
    assert len({g[0] for g in got} & RELEVANT) >= 5
    assert QUERY_TEXT_ID not in {g[0] for g in got}
