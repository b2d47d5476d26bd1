"""Bigram-LM perplexity (`operators/lm.py`) vs a pure-Python reference
implementation, plus the cross-corpus and degenerate-document contracts."""

from __future__ import annotations

import math
from collections import Counter

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.lm import (
    lm_score,
    train_bigram_lm,
)


def _py_lm(train_texts):
    """Reference model: add-one-smoothed bigram counts over lowercased
    whitespace tokens — the definition in the module docstring, computed
    independently (no shared code with the Spark path)."""
    uni, bi = Counter(), Counter()
    for t in train_texts:
        toks = t.strip().lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi, len(uni)


def _py_score(text, uni, bi, v):
    toks = text.strip().lower().split()
    pairs = list(zip(toks, toks[1:]))
    if not pairs:
        return 0, 0.0, 0.0, 1.0
    # mirror the 9-dp per-term quantization so the comparison is exact
    nll = 0
    for p in pairs:
        s = math.log(uni.get(p[0], 0) + v) - math.log(bi.get(p, 0) + 1)
        nll += round(round(s, 9) * 10**9)
    nll_f = nll / 10**9
    avg = nll_f / len(pairs)
    return len(pairs), nll_f, round(avg, 6), round(math.exp(avg), 4)


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "a dog barked at the cat"),
    (3, "entirely novel words appear here once"),
    (4, "the the the the"),  # heavy repetition -> low perplexity tail
    (5, "single"),  # 1 token -> 0 bigrams
    (6, "   "),  # whitespace-only -> 0 tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_self_trained_matches_python_reference(spark, docs):
    uni, bi, v = _py_lm([t for _, t in CORPUS])
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert len(got) == len(CORPUS)
    for doc_id, text in CORPUS:
        n, nll, avg, ppl = _py_score(text, uni, bi, v)
        row = got[doc_id]
        assert row["n_bigrams"] == n, doc_id
        assert row["nll_q9"] == pytest.approx(nll, abs=1e-12), doc_id
        assert row["avg_nll"] == pytest.approx(avg, abs=1e-12), doc_id
        assert row["ppl"] == pytest.approx(ppl, abs=1e-12), doc_id


def test_degenerate_docs_score_zero(spark, docs):
    rows = {r["doc_id"]: r for r in lm_score(docs).collect()}
    for doc_id in (5, 6):
        assert rows[doc_id]["n_bigrams"] == 0
        assert rows[doc_id]["nll_q9"] == 0.0
        assert rows[doc_id]["avg_nll"] == 0.0
        assert rows[doc_id]["ppl"] == 1.0


def test_repetition_scores_lower_than_novelty(spark, docs):
    rows = {r["doc_id"]: r["ppl"] for r in lm_score(docs).collect()}
    # the all-"the" doc is maximally typical; the all-novel doc is the
    # high-perplexity tail CCNet-style filters drop
    assert rows[4] < rows[0] < rows[3]


def test_cross_corpus_scoring_handles_unseen_tokens(spark, docs):
    model = train_bigram_lm(docs)
    new = spark.createDataFrame(
        [(100, "completely unseen vocabulary throughout"),
         (101, "the cat sat on the mat")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lm_score(new, model=model).collect()}
    uni, bi, v = _py_lm([t for _, t in CORPUS])
    for doc_id, text in [(100, new.collect()[0]["text"]), (101, "the cat sat on the mat")]:
        n, nll, avg, ppl = _py_score(text, uni, bi, v)
        assert got[doc_id]["n_bigrams"] == n
        assert got[doc_id]["ppl"] == pytest.approx(ppl, abs=1e-12)
    # unseen everything -> every bigram costs ln(v) - ln(1) = ln(v)
    assert got[100]["avg_nll"] == pytest.approx(round(math.log(v), 6), abs=2e-6)
    # the in-corpus sentence is far more typical than the unseen one
    assert got[101]["ppl"] < got[100]["ppl"]


def test_plan_has_no_python_eval(spark, docs):
    plan = lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_curate_and_prepare_perplexity_band(spark, sf_dir):
    """The CCNet perplexity stage composes into the curation front-end:
    a wide-open band is a no-op, a hostile ceiling empties the corpus,
    and a cross-corpus model changes which documents survive."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
        prepare_training_corpus,
    )

    base_rows = prepare_training_corpus(spark, sf_dir).count()

    wide = curate_and_prepare(spark, sf_dir, ppl_max=1e18)
    assert wide.count() == base_rows

    hostile = curate_and_prepare(spark, sf_dir, ppl_max=1.0 + 1e-9)
    assert hostile.count() == 0

    # a mid-band cut keeps a strict, non-empty subset
    from hive_serde_schema_gen_spark.operators.lm import lm_score
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    ppls = sorted(r["ppl"] for r in lm_score(d).collect())
    cut = ppls[len(ppls) // 2]
    banded = curate_and_prepare(spark, sf_dir, ppl_max=cut)
    assert 0 < banded.count() < base_rows
