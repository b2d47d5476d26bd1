"""quality_signals (`operators/signals.py`): per-column parity with the
component operators, opt-in columns, and plan contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.curation import repetition_stats
from hive_serde_schema_gen_spark.operators.lm import lm_score
from hive_serde_schema_gen_spark.operators.signals import quality_signals
from hive_serde_schema_gen_spark.operators.text import (
    classifier_score,
    quality_features,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

CORPUS = [
    (0, "the cat sat on the mat and it is a fine day for the cat"),
    (1, "der hund und die katze sind in dem haus mit der maus"),
    (2, "spam spam spam spam spam spam spam spam"),
    (3, "x"),
    (4, "   "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_columns_and_coverage(spark, docs):
    out = quality_signals(docs)
    assert set(out.columns) == {
        "doc_id", "n_chars", "n_tokens", "n_punct", "n_stopwords",
        "quality", "pred_lang", "rep_n_grams", "dup_gram_frac",
        "top_gram_frac",
    }
    rows = out.collect()
    assert len(rows) == len(CORPUS)  # every doc gets a row, even empty


def test_component_parity(spark, docs):
    got = {r["doc_id"]: r for r in quality_signals(docs).collect()}
    qf = {r["doc_id"]: r for r in quality_features(docs).collect()}
    rep = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    for doc_id, _ in CORPUS:
        for c in ("n_chars", "n_tokens", "n_punct", "n_stopwords", "quality"):
            assert got[doc_id][c] == qf[doc_id][c], (doc_id, c)
        assert got[doc_id]["dup_gram_frac"] == rep[doc_id]["dup_gram_frac"]
        assert got[doc_id]["top_gram_frac"] == rep[doc_id]["top_gram_frac"]
    # language prediction sanity: en stopwords -> en, de profile -> de
    assert got[0]["pred_lang"] == "en"
    assert got[1]["pred_lang"] == "de"
    # heavy repetition flagged
    assert got[2]["dup_gram_frac"] > 0.5


def test_optional_columns(spark, docs):
    weights = {i: 0.01 * (i % 7) for i in range(64)}
    out = quality_signals(
        docs, classifier_weights=weights, with_ppl=True
    )
    assert {"clf_score", "avg_nll", "ppl"} <= set(out.columns)
    got = {r["doc_id"]: r for r in out.collect()}
    clf = {r["doc_id"]: r["score"] for r in classifier_score(docs, weights).collect()}
    ppl = {r["doc_id"]: r["ppl"] for r in lm_score(docs).collect()}
    for doc_id, _ in CORPUS:
        assert got[doc_id]["clf_score"] == clf[doc_id]
        assert got[doc_id]["ppl"] == ppl[doc_id]


def test_plan_contract(spark, docs):
    assert_no_python_udf(quality_signals(docs))
