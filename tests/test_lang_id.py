"""Language-ID surface (`operators/text.py`): the widened profile set,
the generated argmax chain, margin semantics, and the abstain wrapper."""

from __future__ import annotations

from hive_serde_schema_gen_spark.operators.text import (
    LANG_ORDER,
    LANG_PROFILES,
    lang_id_accuracy,
    lang_id_with_abstain,
    text_lang_id,
)


def test_profiles_cover_order_and_are_nonempty():
    assert set(LANG_ORDER) == set(LANG_PROFILES)
    assert len(LANG_ORDER) >= 8
    assert all(len(ws) >= 5 for ws in LANG_PROFILES.values())


def test_abstain_respects_thresholds(spark, sf_dir):
    out = lang_id_with_abstain(spark, sf_dir, min_margin=1, min_top1=1).collect()
    pred = {
        r["doc_id"]: r["predicted"] for r in text_lang_id(spark, sf_dir).collect()
    }
    assert len(out) == len(pred)
    for r in out:
        if r["predicted"] == "und":
            assert r["margin"] < 1 or r["top1"] < 1, r
        else:
            assert r["predicted"] == pred[r["doc_id"]]
            assert r["margin"] >= 1 and r["top1"] >= 1


def test_abstain_everything_under_impossible_threshold(spark, sf_dir):
    out = lang_id_with_abstain(spark, sf_dir, min_margin=10**6).collect()
    assert out and all(r["predicted"] == "und" for r in out)


def test_accuracy_confusion_totals(spark, sf_dir):
    rows = lang_id_accuracy(spark, sf_dir).collect()
    pred = text_lang_id(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == len(pred)
    # diagonal rows carry n_correct == n; off-diagonal carry 0
    for r in rows:
        want = r["n"] if r["lang"] == r["predicted"] else 0
        assert r["n_correct"] == want, r
