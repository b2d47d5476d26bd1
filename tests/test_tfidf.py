"""TF-IDF top-terms: hand-computed oracle on a tiny corpus + scale shape."""

from __future__ import annotations

import math

import pytest

from hive_serde_schema_gen_spark.operators.text import tfidf_top_terms


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry date"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def _idf(df_t: int, n: int = 4) -> float:
    return math.log((n + 1) / (df_t + 1)) + 1


def test_scores_match_hand_computation(spark, tiny):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["score"], r["rank"])
        for r in tfidf_top_terms(tiny, k=10).collect()
    }
    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert rows[(1, "apple")][0] == 2
    assert rows[(1, "apple")][1] == pytest.approx(2 * _idf(1))
    assert rows[(1, "banana")][1] == pytest.approx(1 * _idf(2))
    # apple (rarer + more frequent) must outrank banana
    assert rows[(1, "apple")][2] == 1
    assert rows[(1, "banana")][2] == 2
    # doc 3: cherry tf=2 df=2, date tf=1 df=1
    assert rows[(3, "cherry")][1] == pytest.approx(2 * _idf(2))
    assert rows[(3, "date")][1] == pytest.approx(1 * _idf(1))
    # empty doc contributes no rows
    assert not any(d == 4 for d, _ in rows)


def test_top_k_and_determinism(spark, tiny):
    out = tfidf_top_terms(tiny, k=1).collect()
    by_doc = {r["doc_id"]: r["term"] for r in out}
    assert by_doc == {1: "apple", 2: "banana", 3: "cherry"}
    assert all(r["rank"] == 1 for r in out)
    # banana vs cherry in doc 2: equal tf=1, equal df=2 → equal score;
    # the term tiebreaker picks 'banana' deterministically
    two = [r["term"] for r in tfidf_top_terms(tiny, k=2).collect() if r["doc_id"] == 2]
    assert two == ["banana", "cherry"]


def test_runs_on_documents_table(spark, sf_dir):
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3)
    n_docs_with_text = d.filter("length(trim(text)) > 0").count()
    got = out.groupBy("doc_id").count().collect()
    assert len(got) == n_docs_with_text
    assert all(r["count"] <= 3 for r in got)
    # no Python eval in the plan — built-ins only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
