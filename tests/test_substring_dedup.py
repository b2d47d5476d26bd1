"""Substring-level exact dedup (repeated >= k-token spans): planted
cross-doc substrings recovered as exact maximal spans, keep-first removal
semantics, and the no-Python-in-plan guarantee."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup import (
    duplicate_spans,
    kgram_postings,
    strip_duplicate_spans,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf


def _brute_spans(corpus: dict[int, list[str]], k: int, keep_first: bool):
    """Independent oracle: mark position (d, p) iff tokens[p:p+k] occurs
    >= 2 times corpus-wide (all occurrences, or all but the globally first
    when keep_first); merge overlapping/adjacent marks into maximal spans."""
    occ: dict[tuple, list] = {}
    for d, toks in sorted(corpus.items()):
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((d, p))
    marked: dict[int, set] = {d: set() for d in corpus}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        flagged = positions[1:] if keep_first else positions
        for d, p in flagged:
            marked[d].add(p)
    spans = []
    for d, ps in marked.items():
        for p in sorted(ps):
            if spans and spans[-1][0] == d and p <= spans[-1][1] + spans[-1][2]:
                s = spans.pop()
                spans.append((d, s[1], max(s[1] + s[2], p + k) - s[1]))
            else:
                spans.append((d, p, k))
    return sorted(spans)


@pytest.fixture(scope="module")
def corpus():
    shared = [f"s{i}" for i in range(15)]  # 15-token run shared by docs 1, 2
    boiler = [f"b{i}" for i in range(8)]  # 8-token run: too short for k=10
    return {
        1: [f"a{i}" for i in range(10)] + shared + [f"c{i}" for i in range(5)],
        2: [f"d{i}" for i in range(3)] + shared + boiler,
        3: [f"e{i}" for i in range(12)] + boiler,
        # doc 4 repeats a 12-token run INTERNALLY (self-repetition counts)
        4: [f"r{i}" for i in range(12)] + ["mid"] + [f"r{i}" for i in range(12)],
        5: [f"u{i}" for i in range(30)],  # fully unique
    }


@pytest.fixture(scope="module")
def docs(spark, corpus):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )


def _got(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in df.collect()
    )


K = 10


def test_postings_count_and_coords(docs, corpus):
    p = kgram_postings(docs, K, hashed=False).collect()
    want = sum(max(0, len(t) - K + 1) for t in corpus.values())
    assert len(p) == want
    by_doc = {(r["doc_id"], r["pos"]): r["gram"] for r in p}
    assert by_doc[(1, 10)] == " ".join(corpus[1][10:20])


def test_flag_all_occurrences_matches_bruteforce(docs, corpus):
    got = _got(duplicate_spans(docs, k=K))
    assert got == _brute_spans(corpus, K, keep_first=False)
    # the planted geometry, spelled out: docs 1+2 share 15 tokens -> ONE
    # maximal 15-token span each; doc 4's internal repeat flags both copies;
    # the 8-token boilerplate is below k and must NOT appear.
    assert (1, 10, 15) in got and (2, 3, 15) in got
    assert (4, 0, 12) in got and (4, 13, 12) in got
    assert not any(d in (3, 5) for d, _, _ in got)


def test_keep_first_excludes_canonical_occurrence(docs, corpus):
    got = _got(duplicate_spans(docs, k=K, keep_first=True))
    assert got == _brute_spans(corpus, K, keep_first=True)
    # first occurrences (doc 1's shared run, doc 4's first repeat) unflagged
    assert got == [(2, 3, 15), (4, 13, 12)]


def test_strip_keeps_exactly_one_copy(docs, corpus):
    out = {r["doc_id"]: r["text"].split() for r in strip_duplicate_spans(docs, k=K).collect()}
    assert out[1] == corpus[1]  # first occurrence untouched
    assert out[2] == corpus[2][:3] + corpus[2][18:]  # shared run stripped
    assert out[4] == corpus[4][:13]  # second internal copy stripped
    assert out[3] == corpus[3] and out[5] == corpus[5]


def test_strip_is_idempotent(spark, docs):
    once = strip_duplicate_spans(docs, k=K)
    again = duplicate_spans(once, k=K, keep_first=True)
    assert again.count() == 0


def test_no_python_eval_in_plan(docs):
    assert_no_python_udf(duplicate_spans(docs, k=K))
    assert_no_python_udf(strip_duplicate_spans(docs, k=K))


def test_spans_on_real_documents(spark, sf_dir):
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    s = duplicate_spans(d, k=8)
    rows = s.collect()
    # structural invariants on real data: coordinates in-bounds, len >= k
    n_toks = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["span_len"] >= 8
        assert 0 <= r["span_start"]
        assert r["span_start"] + r["span_len"] <= n_toks[r["doc_id"]]


def test_duplicate_spans_property_random_corpora(spark):
    """Property check vs the brute-force oracle: random corpora over a
    3-symbol alphabet (maximal k-gram collision pressure — overlapping
    spans, self-repeats, cross-doc repeats all arise naturally), both
    flag-all and keep-first modes.  Example count is small because each
    example is a Spark job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["a", "b", "c"])
    doc = st.lists(token, min_size=0, max_size=14)
    corpus_strat = st.lists(doc, min_size=1, max_size=5)
    K = 3

    @settings(max_examples=15, deadline=None)
    @given(corpus_strat)
    def check(docs_tokens):
        corpus = {i + 1: t for i, t in enumerate(docs_tokens)}
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in corpus.items()],
            "doc_id long, text string",
        )
        for keep_first in (False, True):
            got = _got(duplicate_spans(df, k=K, keep_first=keep_first))
            want = _brute_spans(corpus, K, keep_first=keep_first)
            assert got == want, (corpus, keep_first, got, want)

    check()


def test_no_shuffle_postings_emit_identical_rows(spark, docs, corpus):
    from hive_serde_schema_gen_spark.operators.dedup import (
        kgram_postings_no_shuffle,
    )
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    a = sorted(
        map(tuple, kgram_postings(docs, K, hashed=False).collect())
    )
    b = sorted(
        map(tuple, kgram_postings_no_shuffle(docs, K, hashed=False).collect())
    )
    assert a == b
    # the point of the variant: no exchange before the explode
    assert "Exchange" not in explain_str(
        kgram_postings_no_shuffle(docs, K)
    )
    # and duplicate_spans accepts it, with identical spans
    s1 = _got(duplicate_spans(docs, k=K))
    s2 = _got(duplicate_spans(docs, k=K, postings=kgram_postings_no_shuffle))
    assert s1 == s2


def test_keep_first_with_negative_doc_ids(spark):
    """The round-8 mixed-radix first-occurrence encoding must stay
    monotone for NEGATIVE ids (wet_to_documents derives doc_ids via
    xxhash64, which is signed): globally-first = smallest (id, pos),
    so the span flags the copy in the LARGER id."""
    from hive_serde_schema_gen_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"w{i}" for i in range(10))
    d = spark.createDataFrame(
        [(-50, shared + " tail_a"), (40, "lead_b " + shared)],
        "doc_id long, text string",
    )
    spans = duplicate_spans(d, k=6, keep_first=True).collect()
    assert len(spans) == 1
    s = spans[0]
    # -50 < 40: the -50 occurrence is globally first and kept; the copy
    # in doc 40 (starting at token 1) is the flagged span
    assert s["doc_id"] == 40 and s["span_start"] == 1
    assert s["span_len"] == 10
