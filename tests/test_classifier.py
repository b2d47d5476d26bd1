"""Hashed-ngram linear quality classifier: hand-trained toy weights, scores
verified against an independent Python computation, and the no-Python-plan
guarantee."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.text import (
    classifier_score,
    hashed_ngram_features,
    hashed_ngram_terms,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

B = 4096
DOCS = [
    (1, "good clean prose about science"),
    (2, "buy cheap pills buy cheap pills"),
    (3, "science prose with some cheap pills"),
    (4, ""),  # zero features -> sigmoid(bias)
]
# hand-trained toy model: positive weight on quality-ish terms, negative on
# spam-ish terms, including one bigram each
GOOD = ["science", "prose", "clean prose"]
BAD = ["cheap", "pills", "cheap pills", "buy cheap"]
BIAS = 0.1


def _spark_buckets(spark, terms):
    """Bucket ids via Spark's own xxhash64 — the single source of hash
    truth (no Python xxhash reimplementation to drift)."""
    df = spark.createDataFrame([(t,) for t in terms], "g string").select(
        "g", F.pmod(F.xxhash64("g"), F.lit(B)).alias("bucket")
    )
    return {r["g"]: r["bucket"] for r in df.collect()}


def _ngrams(text, max_n=2):
    toks = text.lower().split()
    out = list(toks)
    for n in range(2, max_n + 1):
        out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(spark):
    buckets = _spark_buckets(spark, GOOD + BAD)
    w = {}
    for t in GOOD:
        w[buckets[t]] = w.get(buckets[t], 0.0) + 2.0
    for t in BAD:
        w[buckets[t]] = w.get(buckets[t], 0.0) - 2.0
    return buckets, w


def test_terms_and_features_count(spark, docs):
    terms = hashed_ngram_terms(docs, n_buckets=B).collect()
    # per doc: n unigrams + (n-1) bigrams
    per_doc = {}
    for r in terms:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    want = {d: 2 * len(t.split()) - 1 for d, t in DOCS if t}
    assert per_doc == want
    feats = hashed_ngram_features(docs, n_buckets=B)
    # doc 2 repeats every feature twice ("buy cheap pills" x2 + the
    # crossing bigram "pills buy"): total occurrences 11 over <= 11 buckets
    f2 = {r["bucket"]: r["cnt"] for r in feats.filter("doc_id = 2").collect()}
    assert sum(f2.values()) == 11


def test_scores_match_independent_computation(spark, docs, model):
    buckets, w = model
    got = {
        r["doc_id"]: (r["n_features"], r["logit"], r["score"])
        for r in classifier_score(
            docs, w, bias=BIAS, n_buckets=B
        ).collect()
    }
    # independent: python ngrams + the bucket map + mean + sigmoid
    for doc_id, text in DOCS:
        grams = _ngrams(text)
        if grams:
            wsum = sum(w.get(buckets.get(g, -1), 0.0) for g in grams)
            logit = BIAS + wsum / len(grams)
        else:
            logit = BIAS
        score = 1.0 / (1.0 + math.exp(-logit))
        n, gl, gs = got[doc_id]
        assert n == len(grams)
        assert abs(gl - logit) < 1e-12 and abs(gs - score) < 1e-12
    # and the model ORDERS docs correctly: clean > mixed > spam
    assert got[1][2] > got[3][2] > got[2][2]
    assert abs(got[4][2] - 1.0 / (1.0 + math.exp(-BIAS))) < 1e-12


def test_weights_as_dataframe_equivalent(spark, docs, model):
    _, w = model
    import pandas as pd

    wdf = spark.createDataFrame(
        pd.DataFrame(sorted(w.items()), columns=["bucket", "w"]),
        "bucket long, w double",
    )
    a = sorted(map(tuple, classifier_score(docs, w, bias=BIAS, n_buckets=B).collect()))
    b = sorted(map(tuple, classifier_score(docs, wdf, bias=BIAS, n_buckets=B).collect()))
    assert a == b


def test_no_python_eval_and_broadcast(spark, docs, model):
    _, w = model
    df = classifier_score(docs, w, bias=BIAS, n_buckets=B)
    assert_no_python_udf(df)
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    assert "BroadcastHashJoin" in explain_str(df)


def test_scores_on_real_documents(spark, sf_dir, model):
    from hive_serde_schema_gen_spark.sources.tables import load_table

    _, w = model
    d = load_table(spark, sf_dir, "documents")
    got = classifier_score(d, w, bias=0.0, n_buckets=B)
    assert got.count() == d.count()
    bounds = got.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()[0]
    assert 0.0 <= bounds["lo"] <= bounds["hi"] <= 1.0


# ---------------------------------------------------------------------------
# Round-13: classifier drift monitor
# ---------------------------------------------------------------------------


def test_score_drift_report_zero_fills_and_sums(spark):
    from hive_serde_schema_gen_spark.operators.logreg import (
        score_drift_report,
    )

    rows = [(0, 0.05), (0, 0.15), (0, 0.95), (1, 0.05), (1, 0.07)]
    d = spark.createDataFrame(rows, "epoch long, score_cal double")
    rep = {
        (r["check"], r["epoch"]): r["metric"]
        for r in score_drift_report(d, bins=10).collect()
    }
    # 2 epochs x (10 bins + cal_sum)
    assert len(rep) == 2 * 11
    assert rep[("q0", 0)] == 1 and rep[("q1", 0)] == 1
    assert rep[("q9", 0)] == 1
    assert rep[("q9", 1)] == 0  # zero-filled, not missing
    assert rep[("q0", 1)] == 2
    assert rep[("cal_sum", 0)] == 50_000_000 + 150_000_000 + 950_000_000
    assert rep[("cal_sum", 1)] == 50_000_000 + 70_000_000
    # out-of-range scores clamp into the edge bins
    d2 = spark.createDataFrame(
        [(0, -0.2), (0, 1.3)], "epoch long, score_cal double"
    )
    rep2 = {
        (r["check"], r["epoch"]): r["metric"]
        for r in score_drift_report(d2, bins=10).collect()
    }
    assert rep2[("q0", 0)] == 1 and rep2[("q9", 0)] == 1


def test_classifier_drift_flags_regime_shift(spark):
    """A bin-level distribution shift (stable histogram, then one epoch
    moves mass between bins) is flagged on BOTH the bin series that
    changed and the score-mass series."""
    from hive_serde_schema_gen_spark.operators.logreg import (
        classifier_drift,
    )

    rows = []
    for e in range(10):
        # mild natural variation so no window is variance-zero
        rows += [(e, 0.35)] * (20 + e % 3) + [(e, 0.75)] * (10 + (e + 1) % 2)
    rows += [(10, 0.35)] * 5 + [(10, 0.75)] * 25  # the drifted epoch
    d = spark.createDataFrame(rows, "epoch long, score_cal double")
    flagged = classifier_drift(d, k=3.0, min_history=5, window=8).collect()
    got = {(r["check"], r["epoch"]) for r in flagged}
    assert ("q3", 10) in got and ("q7", 10) in got
    assert ("cal_sum", 10) in got
    assert all(e == 10 for _, e in got)


def test_drift_rows_flags_planted_epochs(spark, sf_dir):
    """The slot evidence at sf0.001: exactly the planted epochs with
    sufficient clean history are flagged, on the cal_sum series, with
    hugely negative z (the -0.2 regime shift)."""
    from hive_serde_schema_gen_spark.operators.logreg import (
        DRIFT_MIN_HIST,
        DRIFT_MOD,
        DRIFT_REM,
        drift_rows,
    )

    out = drift_rows(spark, sf_dir).collect()
    assert out, "no drift epochs flagged at this SF?"
    for r in out:
        assert r["epoch"] % DRIFT_MOD == DRIFT_REM
        assert r["epoch"] >= DRIFT_MIN_HIST
        assert r["check"] == "cal_sum"
        assert r["z"] < -3
