"""BM25 lexical retrieval: scores match an independent Python oracle, the
plan prunes to query terms before aggregating, and top-k is distributed."""

from __future__ import annotations

import math

import pytest

from hive_serde_schema_gen_spark.operators.text import bm25_topk
from hive_serde_schema_gen_spark.plans.explain import (
    assert_no_python_udf,
    explain_str,
)


def _bm25_oracle(docs, query, k1=1.2, b=0.75):
    terms = sorted({t for t in query.strip().lower().split() if t})
    toks = {d: t.strip().lower().split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    scores = {}
    for d, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


@pytest.fixture(scope="module")
def corpus(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick tutorial on spark spark spark performance",
        3: "dogs and foxes are animals the the the",
        4: "completely unrelated text about cooking pasta",
        5: "quick quick quick brown brown fox",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    return docs, df


def test_bm25_matches_oracle(corpus):
    docs, df = corpus
    q = "quick brown fox"
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, q, k=10).collect()}
    want = _bm25_oracle(docs, q)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    # ranking: doc 5 (heavy tf, short doc) outranks doc 1
    order = [r["doc_id"] for r in bm25_topk(df, q, k=2).collect()]
    assert order[0] == 5


def test_bm25_case_insensitive_and_k(corpus):
    _, df = corpus
    a = bm25_topk(df, "QUICK Fox", k=3).collect()
    b = bm25_topk(df, "quick fox", k=3).collect()
    assert [(r["doc_id"], r["bm25"]) for r in a] == [
        (r["doc_id"], r["bm25"]) for r in b
    ]
    assert len(a) <= 3


def test_bm25_plan_shape(corpus):
    _, df = corpus
    out = bm25_topk(df, "quick fox", k=5)
    assert_no_python_udf(out)
    plan = explain_str(out)
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    # the query-term filter sits below the first aggregate: the per-term
    # postings shuffle carries only matching tokens
    assert "quick" in plan and "Filter" in plan


def test_bm25_empty_query_raises(corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        bm25_topk(df, "   ")


def test_rrf_fusion(corpus, spark):
    from hive_serde_schema_gen_spark.operators.text import rrf_fuse

    _, df = corpus
    lex = bm25_topk(df, "quick brown fox", k=3)
    # a fake "dense" ranking disagreeing with the lexical one
    dense = spark.createDataFrame([(4,), (5,), (2,)], "doc_id int")
    fused = rrf_fuse([lex, dense], k=60).collect()
    got = {r["doc_id"]: r["rrf"] for r in fused}
    lex_ids = [r["doc_id"] for r in lex.collect()]
    # oracle
    want = {}
    for lst in (lex_ids, [4, 5, 2]):
        for i, d in enumerate(lst):
            want[d] = want.get(d, 0.0) + 1.0 / (60 + i + 1)
    assert got == pytest.approx(want)
    # doc 5 appears high in both lists -> top fused
    assert fused[0]["doc_id"] == 5
    with pytest.raises(ValueError):
        rrf_fuse([])
