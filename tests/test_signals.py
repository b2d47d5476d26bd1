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


GOPHER_DOCS = [
    # 60 normal english words -> passes everything
    (10, " ".join(["the quick brown fox jumps over that lazy dog with glee"] * 6)),
    # too short
    (11, "the and of that have with be to"),
    # symbol-heavy: hashes outnumber the 0.1/word cap
    (12, " ".join(["word #### the and of that have with be to"] * 8)),
    # bullet lines dominate
    (13, "\n".join(["- item the and of that have with more words here ok"] * 10)),
    # non-alphabetic tokens dominate
    (14, " ".join(["12345 67890 11111 22222 33333 the and"] * 10)),
]


def test_gopher_rules(spark):
    from hive_serde_schema_gen_spark.operators.signals import gopher_rules

    docs = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[10]["passes_gopher"] is True
    assert got[11]["passes_gopher"] is False  # n_words < 50
    assert got[11]["n_words"] == 8
    assert got[12]["passes_gopher"] is False
    assert got[12]["symbol_word_ratio"] > 0.1
    assert got[13]["passes_gopher"] is False
    assert got[13]["bullet_line_frac"] == 1.0
    assert got[14]["passes_gopher"] is False
    assert got[14]["alpha_word_frac"] < 0.8
    # stop hits: doc 10 has the/that/with/over... -> >= 2 distinct
    assert got[10]["n_stop_hits"] >= 2


def test_gopher_python_mirror(spark):
    """Independent Python computation of every feature for one doc."""
    from hive_serde_schema_gen_spark.operators.signals import gopher_rules

    text = GOPHER_DOCS[2][1]
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    words = text.strip().split()
    lines = text.split("\n")
    import re

    assert r["n_words"] == len(words)
    assert r["mean_word_len"] == pytest.approx(
        sum(len(w) for w in words) / len(words), abs=1e-6
    )
    # symbol-to-word ratio counts MATCHES ('...' is one symbol, weight 1)
    n_sym = len(re.findall(r"[#…]|\.\.\.", text))
    assert r["symbol_word_ratio"] == pytest.approx(n_sym / len(words), abs=1e-6)
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    assert r["alpha_word_frac"] == pytest.approx(alpha / len(words), abs=1e-6)
    assert r["bullet_line_frac"] == 0.0 and len(lines) == 1


def test_gopher_ellipsis_counts_as_one_symbol(spark):
    """'...' weighs 1 (a match), not 3 (its characters) — the paper's
    symbol-to-word ratio; chars-removed counting over-rejects prose."""
    from hive_serde_schema_gen_spark.operators.signals import gopher_rules

    filler = "the and of that have with be to just fine words here"
    # 4 '...' among plain words -> ratio must be 4/n_words, not 12/n_words
    # (text must not END with '...' or the ellipsis-line rule fires too)
    text = "so... well... hmm... yes... " + " ".join([filler] * 4)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    n_words = len(text.split())
    assert r["symbol_word_ratio"] == pytest.approx(4 / n_words, abs=1e-6)
    assert r["symbol_word_ratio"] <= 0.1  # passes under match counting
    assert r["passes_gopher"] is True


def test_gopher_in_bundle(spark, docs):
    out = quality_signals(docs, with_gopher=True)
    assert "passes_gopher" in out.columns
    assert out.count() == len(CORPUS)


def test_gopher_plan_contract(spark):
    from hive_serde_schema_gen_spark.operators.signals import gopher_rules

    docs = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    assert_no_python_udf(gopher_rules(docs))


def test_compression_signals(spark):
    """Repetitive text compresses far better than varied text; entropy
    orders the same way; values match a direct zlib/math computation."""
    import math
    import zlib

    from hive_serde_schema_gen_spark.operators.signals import (
        compression_signals,
    )

    docs = [
        (1, "spam spam spam " * 50),
        (2, "the quick brown fox jumps over the lazy dog and then "
            "wanders through seventeen distinct meadows counting birds"),
        (3, ""),
        (4, None),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in compression_signals(d).collect()}

    for did, t in docs:
        raw = (t or "").encode("utf-8")
        r = rows[did]
        assert r["n_bytes"] == len(raw)
        if raw:
            assert r["compressed_bytes"] == len(zlib.compress(raw, 6))
            assert r["compression_ratio"] == pytest.approx(
                r["compressed_bytes"] / r["n_bytes"]
            )
            n = len(raw)
            counts = {}
            for b in raw:
                counts[b] = counts.get(b, 0) + 1
            want_ent = -sum(
                (k / n) * math.log2(k / n) for k in counts.values()
            )
            assert r["char_entropy"] == pytest.approx(want_ent)
        else:
            assert r["compression_ratio"] == 0.0
            assert r["char_entropy"] == 0.0
    # the separations the filter relies on
    assert rows[1]["compression_ratio"] < rows[2]["compression_ratio"]
    assert rows[1]["char_entropy"] < rows[2]["char_entropy"]


def test_quality_signals_with_compression(spark):
    from hive_serde_schema_gen_spark.operators.signals import (
        quality_signals,
    )

    d = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "varied natural prose")],
        "doc_id long, text string",
    )
    sig = quality_signals(d, with_compression=True)
    rows = {r["doc_id"]: r for r in sig.collect()}
    assert "compression_ratio" in sig.columns
    assert rows[1]["compression_ratio"] < rows[2]["compression_ratio"]
    assert rows[1]["char_entropy"] is not None


def test_compression_signals_string_id(spark):
    # id schema follows the input (ADVICE r13): a string id must survive
    from hive_serde_schema_gen_spark.operators.signals import (
        compression_signals,
    )

    d = spark.createDataFrame(
        [("a", "hello hello hello"), ("b", "xyz")], "k string, text string"
    )
    rows = {
        r["k"]: r for r in compression_signals(d, id_col="k").collect()
    }
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_bytes"] == len("hello hello hello")
