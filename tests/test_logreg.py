"""Distributed logistic-regression training (`operators/logreg.py`):
gradient-descent parity with a numpy reference on the engine's own
features, end-to-end separation of planted quality classes, and the
serve-path composition with ``classifier_score``."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.logreg import (
    BIAS_BUCKET,
    classifier_features,
    split_weights,
    train_classifier,
    train_quality_classifier,
)

GOOD = "the quick study of careful prose yields clear thought and sound judgment"
BAD = "click here buy now free offer winner prize casino jackpot spam deal"


def _corpus(spark, n=40):
    rows = []
    rng = np.random.RandomState(7)
    for i in range(n):
        words = (GOOD if i % 2 == 0 else BAD).split()
        rng.shuffle(words)
        rows.append((i, " ".join(words[:8]), float(1 - i % 2)))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, y double"
    )
    return docs, labels


def _numpy_gd(feats_rows, label_map, iters, lr, l2):
    """Same arithmetic as train_classifier, dense numpy: err = sigmoid(Xw) - y,
    grad = X^T err / N (+ l2 on non-bias), w -= lr*grad."""
    buckets = sorted({b for _, b, _ in feats_rows})
    b_idx = {b: j for j, b in enumerate(buckets)}
    ids = sorted(label_map)
    d_idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), len(buckets)))
    for d, b, x in feats_rows:
        X[d_idx[d], b_idx[b]] += x
    y = np.array([label_map[d] for d in ids])
    w = np.zeros(len(buckets))
    reg = np.array([0.0 if b == BIAS_BUCKET else l2 for b in buckets])
    for _ in range(iters):
        err = 1.0 / (1.0 + np.exp(-(X @ w))) - y
        w -= lr * (X.T @ err / len(ids) + reg * w)
    return {b: w[j] for b, j in b_idx.items()}


@pytest.mark.parametrize("l2", [0.0, 0.01])
def test_gd_matches_numpy_reference(spark, l2):
    docs, labels = _corpus(spark, n=20)
    feats = [
        (r["doc_id"], r["bucket"], r["x"])
        for r in classifier_features(docs, n_buckets=1 << 10).collect()
    ]
    label_map = {r["doc_id"]: r["y"] for r in labels.collect()}
    want = _numpy_gd(feats, label_map, iters=10, lr=1.5, l2=l2)
    got = {
        r["bucket"]: r["w"]
        for r in train_classifier(
            docs, labels, n_buckets=1 << 10, iters=10, lr=1.5, l2=l2
        ).collect()
    }
    assert set(got) == set(want)
    for b in want:
        # float sums reassociate across partitions — tolerance, not equality
        assert got[b] == pytest.approx(want[b], abs=1e-9), b


def test_trained_model_separates_planted_classes(spark):
    docs, labels = _corpus(spark, n=40)
    scored = train_quality_classifier(
        docs, labels, n_buckets=1 << 12, iters=30, lr=2.0
    )
    joined = {r["doc_id"]: r["score"] for r in scored.collect()}
    y = {r["doc_id"]: r["y"] for r in labels.collect()}
    acc = np.mean([(joined[d] >= 0.5) == (y[d] == 1.0) for d in y])
    assert acc >= 0.95, acc
    # scores are genuine probabilities, split around the boundary
    good = [s for d, s in joined.items() if y[d] == 1.0]
    bad = [s for d, s in joined.items() if y[d] == 0.0]
    assert min(good) > max(bad)


def test_bias_only_training_on_empty_text(spark):
    """Docs with no features still train: the intercept moves toward the
    base rate instead of the docs dropping out of the feature join."""
    docs = spark.createDataFrame(
        [(0, ""), (1, ""), (2, ""), (3, "")], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 1.0), (3, 0.0)], "doc_id long, y double"
    )
    w = train_classifier(docs, labels, iters=50, lr=2.0)
    _, bias = split_weights(w)
    # base rate 0.75 -> positive intercept near ln(3)
    assert 0.2 < bias < 3.0


def test_scoring_composition_matches_manual_split(spark):
    docs, labels = _corpus(spark, n=20)
    w = train_classifier(docs, labels, n_buckets=1 << 10, iters=5)
    fw, bias = split_weights(w)
    from hive_serde_schema_gen_spark.operators.text import classifier_score

    a = {
        r["doc_id"]: r["score"]
        for r in classifier_score(docs, fw, bias=bias, n_buckets=1 << 10).collect()
    }
    b = {
        r["doc_id"]: r["score"]
        for r in train_quality_classifier(
            docs, labels, n_buckets=1 << 10, iters=5
        ).collect()
    }
    assert a.keys() == b.keys()
    for d in a:
        assert a[d] == pytest.approx(b[d], abs=1e-12)


def test_training_plan_stays_jvm_side(spark):
    docs, labels = _corpus(spark, n=8)
    w = train_classifier(docs, labels, n_buckets=1 << 10, iters=2)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_mode_partitioning_invariant(spark):
    """exact=True replaces every float reduction with a 9-dp decimal sum
    (the lm.py rule) — the fitted weights must be BIT-identical under any
    input partitioning (the float path only promises ULP-closeness)."""
    docs, labels = _corpus(spark)
    kw = dict(n_buckets=32, iters=3, lr=1.0, exact=True, hash_fn="md5")
    w1 = {r["bucket"]: r["w"] for r in train_classifier(docs, labels, **kw).collect()}
    w2 = {
        r["bucket"]: r["w"]
        for r in train_classifier(
            docs.repartition(7), labels.repartition(3), **kw
        ).collect()
    }
    assert w1 == w2  # exact equality, not approx


def test_exact_mode_close_to_float_path(spark):
    """The exact-decimal fit is the float fit up to rounding grain — same
    model, different reduction discipline."""
    docs, labels = _corpus(spark)
    base = dict(n_buckets=32, iters=3, lr=1.0)
    wf = {r["bucket"]: r["w"] for r in train_classifier(docs, labels, **base).collect()}
    we = {
        r["bucket"]: r["w"]
        for r in train_classifier(docs, labels, exact=True, **base).collect()
    }
    assert set(wf) == set(we)
    for b in wf:
        assert abs(wf[b] - we[b]) < 1e-6, b


def test_calibrate_classifier_matches_reference(spark):
    """Platt GD steps match a pure-Python re-derivation of the same
    expression order (9-dp rounds, exact-decimal sums)."""
    import math

    from hive_serde_schema_gen_spark.operators.logreg import (
        calibrate_classifier,
    )

    data = [(1, 2.0, 1.0), (2, -1.5, 0.0), (3, 0.5, 1.0), (4, -0.25, 0.0)]
    scored = spark.createDataFrame(
        [(i, z) for i, z, _ in data], "doc_id long, logit double"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in data], "doc_id long, y double"
    )
    params, calibrated = calibrate_classifier(
        scored, labels, iters=3, lr=1.0
    )
    got = {r["iter"]: (r["a"], r["b"]) for r in params.collect()}

    a, b = 1.0, 0.0
    n = len(data)
    want = {}
    for it in range(1, 4):
        errs = [
            (z, round(1.0 / (1.0 + math.exp(-(a * z + b))) - y, 9))
            for _, z, y in data
        ]
        ga = float(sum(round(e * z, 9) for z, e in errs))
        gb = float(sum(e for _, e in errs))
        a = round(a - 1.0 * ga / n, 9)
        b = round(b - 1.0 * gb / n, 9)
        want[it] = (a, b)
    for it in want:
        assert got[it][0] == pytest.approx(want[it][0], abs=2e-9), it
        assert got[it][1] == pytest.approx(want[it][1], abs=2e-9), it
    cal = {r["doc_id"]: r for r in calibrated.collect()}
    for i, z, y in data:
        assert cal[i]["logit"] == z
        assert cal[i]["score_cal"] == pytest.approx(
            round(1.0 / (1.0 + math.exp(-(a * z + b))), 9), abs=2e-9
        )
        assert cal[i]["y"] == int(y)


def test_calibrate_classifier_empty_raises(spark):
    from hive_serde_schema_gen_spark.operators.logreg import (
        calibrate_classifier,
    )

    empty = spark.createDataFrame([], "doc_id long, logit double")
    labels = spark.createDataFrame([], "doc_id long, y double")
    with pytest.raises(ValueError, match="no held-out"):
        calibrate_classifier(empty, labels)


def test_classifier_score_calibrated_composes(spark, sf_dir):
    """Calibrated serving = raw scoring + the LAST Platt step, applied
    over fresh documents (the full-corpus pass the calibration exists
    for)."""
    import math

    from hive_serde_schema_gen_spark.operators.logreg import (
        CLF_BUCKETS,
        CLF_NGRAM,
        calibration_rows,
        classifier_fit_rows,
        classifier_score_calibrated,
    )

    w = classifier_fit_rows(spark, sf_dir).localCheckpoint()
    params, _ = calibration_rows(spark, sf_dir, weights=w)
    pw = {r["iter"]: (r["a"], r["b"]) for r in params.collect()}
    a, b = pw[max(pw)]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id % 10 = 3"
    ).select("doc_id", "text")
    out = classifier_score_calibrated(
        docs, w, params, n_buckets=CLF_BUCKETS, max_ngram=CLF_NGRAM,
        hash_fn="md5",
    ).collect()
    assert len(out) == docs.count()
    for r in out:
        want = round(1.0 / (1.0 + math.exp(-(a * r["logit"] + b))), 9)
        assert r["score_cal"] == pytest.approx(want, abs=2e-9)
        assert 0.0 <= r["score_cal"] <= 1.0
