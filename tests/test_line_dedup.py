"""Line-level (paragraph) boilerplate dedup — CCNet-style: planted shared
lines flagged and stripped, untouched docs byte-identical, keep-first
semantics, idempotence, and a brute-force oracle over random corpora."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup import (
    boilerplate_lines,
    strip_boilerplate_lines,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

BOILER = "subscribe to our newsletter"
NAV = "home | about | contact"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, f"{NAV}\nunique alpha content one\n{BOILER}"),
            (2, f"{NAV}\nunique beta content two\n\n{BOILER}"),
            (3, f"{NAV}\nunique gamma content three"),
            (4, "totally unrelated document with no shared lines"),
            (5, f"{BOILER}"),  # fully-boilerplate doc
            (6, f"  {BOILER}  \npadded but same after trim"),
        ],
    )


def test_boilerplate_lines_flags_shared(corpus):
    flagged = {
        r["line"].strip(): r["n_docs"]
        for r in boilerplate_lines(corpus, min_docs=2).collect()
    }
    assert flagged == {NAV: 3, BOILER: 4}


def test_empty_lines_never_flagged(corpus):
    # doc 2 has an empty line; an empty line "shared" by many docs must not
    # appear in the boilerplate set
    lines = [r["line"] for r in boilerplate_lines(corpus, min_docs=2).collect()]
    assert "" not in [ln.strip() for ln in lines]


def test_strip_removes_all_occurrences(corpus):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(corpus, min_docs=2).collect()
    }
    assert out[1] == "unique alpha content one"
    assert out[2] == "unique beta content two\n"  # empty line preserved
    assert out[3] == "unique gamma content three"
    assert out[5] == ""  # fully-boilerplate doc → empty text
    # whitespace-padded variant of the boilerplate line is stripped too
    assert out[6] == "padded but same after trim"


def test_untouched_doc_byte_identical(spark):
    # a doc with trailing whitespace / odd spacing that a re-split+re-join
    # would normalize: it has no flagged line, so text must pass through raw
    docs = _docs(
        spark,
        [
            (1, "weird   spacing \n and trailing  "),
            (2, f"{BOILER}\nx"),
            (3, f"{BOILER}\ny"),
        ],
    )
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate_lines(docs).collect()}
    assert out[1] == "weird   spacing \n and trailing  "
    assert out[2] == "x"
    assert out[3] == "y"


def test_keep_first_retains_one_copy(corpus):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(
            corpus, min_docs=2, keep_first=True
        ).collect()
    }
    # globally-first occurrence = min (doc_id, line_no): NAV first appears in
    # doc 1 line 0, BOILER in doc 1 line 2 — doc 1 keeps both
    assert out[1] == f"{NAV}\nunique alpha content one\n{BOILER}"
    assert out[2] == "unique beta content two\n"
    assert out[3] == "unique gamma content three"
    assert out[5] == ""
    corpus_lines = "\n".join(out.values()).split("\n")
    assert corpus_lines.count(NAV) == 1
    assert sum(1 for ln in corpus_lines if ln.strip() == BOILER) == 1


@pytest.mark.parametrize("keep_first", [False, True])
def test_idempotent(corpus, keep_first):
    once = strip_boilerplate_lines(corpus, min_docs=2, keep_first=keep_first)
    twice = strip_boilerplate_lines(once, min_docs=2, keep_first=keep_first)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


def test_matches_brute_force_oracle(spark):
    import random

    rng = random.Random(7)
    vocab = [f"line-{i}" for i in range(8)]
    rows = [
        (d, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 6))))
        for d in range(20)
    ]
    docs = _docs(spark, rows)

    # oracle: count distinct docs per (trimmed, non-empty) line; drop all
    # occurrences of lines in >= 2 docs
    from collections import defaultdict

    per_line = defaultdict(set)
    for d, text in rows:
        for ln in text.split("\n"):
            if ln.strip():
                per_line[ln.strip()].add(d)
    flagged = {ln for ln, ds in per_line.items() if len(ds) >= 2}
    expect = {
        d: "\n".join(ln for ln in text.split("\n") if ln.strip() not in flagged)
        for d, text in rows
    }
    got = {r["doc_id"]: r["text"] for r in strip_boilerplate_lines(docs).collect()}
    assert got == expect


def test_no_python_udf(corpus):
    assert_no_python_udf(strip_boilerplate_lines(corpus))
    assert_no_python_udf(boilerplate_lines(corpus))


def test_strip_boilerplate_property_random_corpora(spark):
    """Property check vs a brute-force oracle: random multi-line corpora
    over a 4-line alphabet (high collision pressure), both keep-first and
    drop-all modes.  Few examples — each is a Spark job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line = st.sampled_from(["p", "q", "r", ""])  # includes empty lines
    doc = st.lists(line, min_size=1, max_size=5)
    corpus_strat = st.lists(doc, min_size=1, max_size=5)

    def brute(corpus, keep_first):
        from collections import defaultdict

        per_line = defaultdict(list)  # line -> [(doc, line_no)] in order
        for d in sorted(corpus):
            for i, ln in enumerate(corpus[d]):
                if ln.strip():
                    per_line[ln.strip()].append((d, i))
        flagged = set()
        for occs in per_line.values():
            if len({d for d, _ in occs}) >= 2:
                keep = {min(occs)} if keep_first else set()
                flagged |= set(occs) - keep
        return {
            d: "\n".join(
                ln
                for i, ln in enumerate(lines)
                if (d, i) not in flagged
            )
            for d, lines in corpus.items()
        }

    @settings(max_examples=12, deadline=None)
    @given(corpus_strat)
    def check(docs_lines):
        corpus = {i + 1: lines for i, lines in enumerate(docs_lines)}
        df = _docs(
            spark, [(d, "\n".join(lines)) for d, lines in corpus.items()]
        )
        for keep_first in (False, True):
            got = {
                r["doc_id"]: r["text"]
                for r in strip_boilerplate_lines(
                    df, min_docs=2, keep_first=keep_first
                ).collect()
            }
            want = brute(corpus, keep_first)
            assert got == want, (corpus, keep_first, got, want)

    check()


def test_metachar_delimiter_is_literal(spark):
    # '.' as delimiter must split on literal dots, not "any char"
    docs = _docs(
        spark,
        [
            (1, "shared seg.unique one"),
            (2, "shared seg.unique two"),
            (3, "standalone text"),
        ],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(docs, min_docs=2, delim=".").collect()
    }
    assert out[1] == "unique one"
    assert out[2] == "unique two"
    assert out[3] == "standalone text"
