"""BPE training/encoding: merge-for-merge parity with a reference Python
implementation (Sennrich-style), deterministic ties, early stop, and the
encode round-trip."""

from __future__ import annotations

from collections import Counter

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.bpe import (
    END,
    encode_bpe,
    train_bpe,
    word_frequencies,
)


def _ref_train(texts, n_merges):
    """Reference BPE trainer over the word-frequency table."""
    wf = Counter()
    for t in texts:
        wf.update(t.lower().split())
    vocab = {tuple(list(w) + [END]): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        cands = [(n, p) for p, n in pairs.items() if n >= 2]
        if not cands:
            break
        # deterministic tie-break: highest count, then lexicographic pair
        top_n = max(n for n, _ in cands)
        best = min(p for n, p in cands if n == top_n)
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            s, i, res = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    res.append(s[i] + s[i + 1])
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "low newer wide wider",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )


def test_word_frequencies(docs):
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf["low"] == 4 and wf["newer"] == 3 and wf["wide"] == 1


def test_merges_match_reference(docs):
    got = train_bpe(docs, n_merges=8)
    want = _ref_train(TEXTS, 8)
    assert got == want


def test_early_stop_when_no_repeats(spark):
    d = spark.createDataFrame([(1, "ab cd ef")], "doc_id int, text string")
    # every word unique, every char pair occurs once per word → count < 2
    # for all pairs except none; 100 requested merges stop early
    merges = train_bpe(d, n_merges=100)
    assert len(merges) < 100


def test_encode_uses_merges(docs):
    merges = train_bpe(docs, n_merges=8)
    out = {r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(docs, merges).collect()}
    # encoding is consistent with the reference greedy-by-rank encode
    ranks = {p: i for i, p in enumerate(merges)}

    from hive_serde_schema_gen_spark.operators.bpe import _encode_word

    for i, t in enumerate(TEXTS):
        want = []
        for w in t.lower().split():
            want.extend(_encode_word(w, ranks))
        assert out[i] == want
    # merged symbols actually appear (fewer tokens than characters)
    n_chars = sum(len(w) + 1 for w in TEXTS[0].split())
    assert 0 < len(out[0]) < n_chars


def test_encode_null_and_empty(spark):
    d = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "low")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(d, [("l", "o")]).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["lo", "w", END]


def test_bpe_counts_feed_packing(spark, docs):
    """Composition: BPE-encoded token counts drive best-fit packing via
    the existing token_count_col hook — the BPE-accurate packing path."""
    import pyspark.sql.functions as F

    from hive_serde_schema_gen_spark.operators.packing import (
        pack_documents_best_fit,
    )

    merges = train_bpe(docs, n_merges=6)
    enc = encode_bpe(docs, merges)
    packed = pack_documents_best_fit(
        enc, context_len=30, token_count_col=F.size("bpe_tokens")
    ).collect()
    by_doc = {r["doc_id"]: r for r in packed}
    enc_rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    assert set(by_doc) == set(enc_rows)
    for d, toks in enc_rows.items():
        assert by_doc[d]["n_tokens"] == len(toks)


def test_nbsp_word_consistent_between_train_and_encode(spark):
    """Non-ASCII whitespace (NBSP) is NOT a separator in Java's \\s — the
    encoder must agree, or merges learned across the NBSP never apply."""
    t = "foo bar foo bar foo bar"
    d = spark.createDataFrame([(1, t)], "doc_id int, text string")
    wf = {r["word"]: r["freq"] for r in word_frequencies(d).collect()}
    assert wf == {"foo bar": 3}  # one word, not two
    merges = train_bpe(d, n_merges=3)
    out = encode_bpe(d, merges).collect()[0]["bpe_tokens"]
    # encoder saw the same single-word tokenization: 3 repeats of the
    # same encoding, each ending with exactly one END marker
    assert len(out) % 3 == 0
    third = len(out) // 3
    assert out[:third] == out[third : 2 * third] == out[2 * third :]
    assert out[:third][-1].endswith(END)


def test_batched_training_contract(spark, docs):
    """batch_size=M is the documented approximation: per round the
    selected pairs must be pairwise symbol-DISJOINT (that is what keeps
    their batch-start counts exact at application time), the first merge
    must equal exact BPE's first merge (it is selected from the same
    table), and the merge list must drive the encoder to a valid
    segmentation (tokens reassemble each word)."""
    exact = train_bpe(docs, 6, batch_size=1)
    batched = train_bpe(docs, 6, batch_size=3)
    assert len(batched) == 6
    assert batched[0] == exact[0]
    # rounds are [0:3] and [3:6]: check within-round symbol disjointness
    for lo in (0, 3):
        used: set = set()
        for left, right in batched[lo:lo + 3]:
            assert left not in used and right not in used, batched
            used.update((left, right))
    enc = encode_bpe(docs, batched).select("text", "bpe_tokens").collect()
    for r in enc:
        rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())


def test_batched_training_cuts_jobs_per_merge(spark, docs):
    """The point of batch_size: one count + one rewrite + one checkpoint
    per M merges instead of per merge — measured as Spark jobs with AQE
    off (the pagerank job-count convention)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(batch_size, group):
        sc.setJobGroup(group, group)
        try:
            train_bpe(docs, 6, batch_size=batch_size)
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j1 = jobs_for(1, "bpe-b1")
        j3 = jobs_for(3, "bpe-b3")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # 6 merges: exact runs 6 rounds, batched runs 2 -> at least 2x fewer
    assert j3 * 2 <= j1, (j1, j3)


def _oracle_merges(texts, n_merges=None):
    import duckdb
    import pandas as pd

    from hive_serde_schema_gen_spark.operators.bpe import sql_bpe_ctes

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    kw = {} if n_merges is None else {"n_merges": n_merges}
    return [
        (l, r)
        for _, l, r in con.execute(
            f"WITH {sql_bpe_ctes(**kw)} SELECT rank, l, r FROM bpem "
            "ORDER BY rank"
        ).fetchall()
    ]


def test_sql_unroll_matches_train(spark):
    """The oracle CTE chain re-derives the operator's merges on a corpus
    with ties, repeats, and self-overlapping runs ('aaaa' stresses the
    left-to-right in-word pass the list_reduce must mirror)."""
    texts = [
        "the quick brown fox the quick",
        "aaaa aaaa aaaa baab",
        "the them theme these",
        "quick quack quark",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(d, 8)
    assert got == _oracle_merges(texts, 8)


def test_sql_unroll_early_stop_is_identity(spark):
    """When no pair reaches count 2 before the configured rounds, the
    operator stops early and the oracle's remaining rounds must be
    identity passes, not empty cross joins."""
    texts = ["ab ab", "ab cd"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(d, 8)
    assert 0 < len(got) < 8  # genuinely stops early
    assert got == _oracle_merges(texts)


# ---------------------------------------------------------------------------
# Round-14: GPT-2-style pretokenizer (opt-in mode="gpt2")
# ---------------------------------------------------------------------------

MULTILINGUAL = [
    "hello world, it's 2024!",
    "we'll don't  double  space",
    "汉字测试 mixed ascii",
    "tabs\tand\nnewlines",
    "nbsp inside",
    "num123abc 45.67",
    "'quote 'd 'x trailing '",
    "ends with space ",
    "  leading",
    "ひらがな καὶ кириллица",
    "emoji 😀 mix",
    "vertical\x0btab and\x0b mix",  # VT: Java \s has it, RE2's does not
    "",
]


def test_pretokenizer_three_way_parity(spark):
    """One pattern literal, three engines: Spark's Java regex, DuckDB's
    RE2, and the pure-Python category scanner must pretokenize the
    multilingual fixtures IDENTICALLY — the class-twin property the
    op='pretok' oracle branch rests on."""
    import duckdb

    from hive_serde_schema_gen_spark.operators.bpe import (
        PRETOKEN_PATTERN,
        pretokenize_py,
        pretokens,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(MULTILINGUAL)], "i long, t string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i", pretokens(F.col("t"), lowercase=False, mode="gpt2").alias("p")
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(MULTILINGUAL):
        py = pretokenize_py(s)
        assert got[i] == py, f"spark vs scanner on {s!r}"
        re2 = con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, PRETOKEN_PATTERN]
        ).fetchone()[0]
        assert re2 == py, f"re2 vs scanner on {s!r}"
        # lossless: pretokens concatenate back to the input
        assert "".join(py) == s


def _ref_train_gpt2(texts, n_merges):
    """The reference trainer over GPT-2 pretokens (scanner-tokenized)."""
    from hive_serde_schema_gen_spark.operators.bpe import pretokenize_py

    wf = Counter()
    for t in texts:
        wf.update(pretokenize_py(t.lower()))
    vocab = {tuple(list(w) + [END]): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        cands = [(n, p) for p, n in pairs.items() if n >= 2]
        if not cands:
            break
        top_n = max(n for n, _ in cands)
        best = min(p for n, p in cands if n == top_n)
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            s, i, res = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    res.append(s[i] + s[i + 1])
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


GPT2_TEXTS = [
    "it's low, it's lower, it's the lowest!",
    "we don't go lower. they don't go low...",
    "price 100 and 1000 and 10000 now",
    "low low low 'll we'll they'll",
]


def test_gpt2_mode_merges_match_reference(spark):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GPT2_TEXTS)], "doc_id long, text string"
    )
    got = train_bpe(d, 10, mode="gpt2")
    assert got == _ref_train_gpt2(GPT2_TEXTS, 10)
    # the learned space-prefixed units only exist under gpt2 pretokens:
    # some merge must involve a symbol containing a leading space
    assert any(l.startswith(" ") for l, r in got)


def test_gpt2_mode_encode_round_trip(spark):
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GPT2_TEXTS)], "doc_id long, text string"
    )
    merges = train_bpe(d, 8, mode="gpt2")
    enc = encode_bpe(d, merges, mode="gpt2")
    rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    for i, t in enumerate(GPT2_TEXTS):
        toks = rows[i]
        # tokens reassemble the pretoken stream: strip END markers and
        # concatenate
        joined = "".join(tok[: -len(END)] if tok.endswith(END) else tok
                         for tok in toks)
        assert joined == t.lower()
    # train/encode consistency: encoding the training corpus uses the
    # merged symbols (at least one token longer than 1 char + END)
    assert any(
        len(tok) > len(END) + 1 for toks in rows.values() for tok in toks
    )


def test_mode_rejects_unknown(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        word_frequencies(d, mode="nope")
    with pytest.raises(ValueError):
        encode_bpe(d, [], mode="nope")


def test_fertility_report(spark):
    from hive_serde_schema_gen_spark.operators.bpe import fertility_report

    d = spark.createDataFrame(
        [
            (1, "low low lower", "a"),
            (2, "low newest", "a"),
            (3, "wide wider", "b"),
        ],
        "doc_id long, text string, source string",
    )
    merges = train_bpe(d, 4)
    rows = {r["domain"]: r for r in fertility_report(d, merges).collect()}
    assert set(rows) == {"a", "b"}
    a = rows["a"]
    assert a["n_docs"] == 2 and a["ws_tokens"] == 5
    assert a["n_bytes"] == len("low low lower") + len("low newest")
    # exact quotients of the pinned integers
    assert a["fertility"] == a["bpe_tokens"] / a["ws_tokens"]
    assert a["bytes_per_token"] == a["n_bytes"] / a["bpe_tokens"]
    # merged symbols compress: fewer BPE tokens than characters
    assert a["bpe_tokens"] < a["n_bytes"]
