"""Curation operators: benchmark decontamination + PII redaction."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.curation import (
    ngram_contamination,
    redact_pii,
    word_ngrams,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # contains benchmark item 1 verbatim (8+ words)
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            # shares no 4-gram with any benchmark item
            (2, "completely unrelated text about spark partitions and shuffles here"),
            # contains half of benchmark item 2
            (3, "alpha beta gamma delta unrelated tail of this document"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),
            (102, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "bench_id long, text string",
    )


def test_word_ngrams_counts(spark, corpus):
    # doc 2 has 9 words → 6 distinct 4-grams
    got = (
        word_ngrams(corpus.filter("doc_id = 2"), 4, hashed=False)
        .collect()
    )
    assert len(got) == 6
    assert all(len(r["gram"].split(" ")) == 4 for r in got)


def test_contamination_detects_verbatim_inclusion(spark, corpus, bench_set):
    out = {
        (r["doc_id"], r["bench_id"]): r
        for r in ngram_contamination(corpus, bench_set, n=4).collect()
    }
    # doc 1 contains ALL of bench 101's 4-grams (9 words → 6 grams)
    r = out[(1, 101)]
    assert r["n_shared"] == r["bench_grams"] == 6
    assert r["frac_bench_matched"] == pytest.approx(1.0)
    # doc 3 shares exactly one 4-gram with bench 102 (alpha beta gamma delta)
    r = out[(3, 102)]
    assert r["n_shared"] == 1
    assert r["frac_bench_matched"] == pytest.approx(1 / 5)
    # no other pairs: doc 2 is clean
    assert set(out) == {(1, 101), (3, 102)}


def test_contamination_plan_broadcasts_benchmark(spark, corpus, bench_set):
    plan = (
        ngram_contamination(corpus, bench_set, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_redact_pii(spark):
    d = spark.createDataFrame(
        [
            (
                1,
                "mail a@b.com ssn 123-45-6789 card 4111 1111 1111 1111 "
                "phone +1 555-867-5309 ip 10.0.0.1 end",
            ),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(d).collect()}
    t = rows[1]["text"]
    for tag in ("<EMAIL>", "<SSN>", "<CARD>", "<PHONE>", "<IP>"):
        assert tag in t, t
    assert "a@b.com" not in t and "123-45-6789" not in t
    assert rows[1]["n_email"] == 1
    assert rows[1]["n_ssn"] == 1
    assert rows[1]["n_card"] == 1
    assert rows[1]["n_ipv4"] == 1
    assert rows[2]["text"] == "nothing sensitive here"
    assert rows[2]["n_email"] == 0
    # narrow transformation: no shuffle in the plan
    plan = redact_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redaction_runs_on_documents(spark, sf_dir):
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    out = redact_pii(d)
    assert out.count() == d.count()
    assert {f"n_{n}" for n, _, _ in __import__(
        "hive_serde_schema_gen_spark.operators.curation", fromlist=["_PII_RULES"]
    )._PII_RULES}.issubset(set(out.columns))


def test_stratified_sample_deterministic_and_rate_accurate(spark):
    from hive_serde_schema_gen_spark.operators.curation import stratified_sample

    d = spark.createDataFrame(
        [(i, "wiki" if i % 3 == 0 else "web") for i in range(3000)],
        "doc_id long, source string",
    )
    rates = {"wiki": 1.0, "web": 0.3}
    a = {r["doc_id"] for r in stratified_sample(d, rates).collect()}
    b = {r["doc_id"] for r in stratified_sample(d, rates).collect()}
    assert a == b  # reproducible across runs
    wiki_ids = {i for i in range(3000) if i % 3 == 0}
    assert wiki_ids <= a  # rate 1.0 keeps everything
    web_kept = len(a - wiki_ids)
    assert 0.25 * 2000 < web_kept < 0.35 * 2000  # ~30% of 2000
    # unlisted strata are dropped entirely
    d2 = d.withColumn(
        "source", F.when(F.col("doc_id") < 100, "logs").otherwise(F.col("source"))
    )
    c = {r["doc_id"] for r in stratified_sample(d2, rates).collect()}
    assert all(i >= 100 for i in c)
    # changing one stratum's rate never disturbs another stratum's kept set
    d3 = stratified_sample(d, {"wiki": 1.0, "web": 0.1})
    kept_web_small = {r["doc_id"] for r in d3.collect()} - wiki_ids
    assert kept_web_small <= (a - wiki_ids)


def test_repetition_stats(spark):
    from hive_serde_schema_gen_spark.operators.curation import repetition_stats

    d = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),   # pure template
            (2, "each word here appears just once total"),
            (3, "ab"),                                 # shorter than n
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d, n=3).collect()}
    # doc 1: 8 words -> 6 trigram occurrences over 2 distinct grams
    assert rows[1]["n_grams"] == 6
    assert rows[1]["dup_gram_frac"] == pytest.approx(4 / 6)
    assert rows[1]["top_gram_frac"] == pytest.approx(3 / 6)
    # doc 2: no repeats
    assert rows[2]["dup_gram_frac"] == 0.0
    assert rows[2]["top_gram_frac"] == pytest.approx(1 / 5)
    # doc 3: too short for any trigram — present with zeros, not dropped
    assert rows[3]["n_grams"] == 0
    assert rows[3]["dup_gram_frac"] == 0.0


def test_curate_and_prepare_end_to_end(spark, sf_dir):
    """The full curation front-end composes with the manifest pipeline:
    decontamination drops a doc whose text is a benchmark item verbatim;
    domain mixing keeps strata independent; the output manifest has the
    base pipeline's schema and determinism."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
        prepare_training_corpus,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    base = prepare_training_corpus(spark, sf_dir)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}

    # benchmark = one surviving document's text verbatim → that doc (and
    # only contaminated docs) must vanish from the curated manifest
    victim = min(base_ids)
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") == victim
    ).selectExpr("doc_id AS bench_id", "text")
    curated = curate_and_prepare(spark, sf_dir, benchmark=bench)
    curated_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert victim not in curated_ids
    assert curated_ids <= base_ids
    assert curated.columns == base.columns

    # mixing: rate-0 stratum for every source drops everything
    sources = [
        r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .collect()
    ]
    none_kept = curate_and_prepare(
        spark, sf_dir, mix_rates={s: 0.0 for s in sources}
    )
    assert none_kept.count() == 0


# ---------------------------------------------------------------------------
# Temperature mixing (rates feeding stratified_sample)
# ---------------------------------------------------------------------------


def test_temperature_rates_math():
    from hive_serde_schema_gen_spark.operators.curation import (
        temperature_mix_rates,
    )

    counts = {"web": 90_000, "wiki": 9_000, "code": 1_000}
    # alpha=1 == natural proportions: every stratum sampled at total/N
    r1 = temperature_mix_rates(counts, alpha=1.0, total=10_000)
    for s, n in counts.items():
        assert abs(r1[s] - 10_000 / 100_000) < 1e-12
    # alpha=0 == uniform shares: equal expected rows per stratum
    r0 = temperature_mix_rates(counts, alpha=0.0, total=3_000)
    expected_rows = {s: r0[s] * counts[s] for s in counts}
    assert all(abs(v - 1_000) < 1e-6 for v in expected_rows.values())
    # alpha in between boosts the tail monotonically
    r7 = temperature_mix_rates(counts, alpha=0.7, total=10_000)
    assert r7["code"] > r1["code"] and r7["web"] < r7["wiki"] < r7["code"]
    # auto-total: max rate is exactly 1.0 (most-boosted stratum kept whole)
    ra = temperature_mix_rates(counts, alpha=0.3)
    assert abs(max(ra.values()) - 1.0) < 1e-12
    # cap: a tiny stratum cannot be asked for more rows than it has
    rc = temperature_mix_rates(counts, alpha=0.0, total=90_000)
    assert rc["code"] == 1.0


def test_temperature_rates_drive_stratified_sample(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.curation import (
        stratified_sample,
        stratum_counts,
        temperature_mix_rates,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    counts = stratum_counts(d)
    assert sum(counts.values()) == d.count()
    rates = temperature_mix_rates(counts, alpha=0.5, total=200)
    kept = stratified_sample(d, rates)
    got = kept.count()
    # hash-threshold sampling: expected 200, binomial spread is wide at
    # 20 strata x 25 docs -- just pin plausibility and determinism
    assert 100 <= got <= 300
    assert stratified_sample(d, rates).count() == got  # deterministic


def test_curate_and_prepare_new_stages(spark, sf_dir):
    """Round-7 stages compose: the learned-classifier gate keeps/drops by
    score, and substring-span stripping slots in before hashing."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
        prepare_training_corpus,
    )

    base = prepare_training_corpus(spark, sf_dir)
    base_rows = base.count()

    # neutral classifier (no weights, bias 0): sigmoid(0) = 0.5 passes the
    # default floor -> identical manifest
    neutral = curate_and_prepare(spark, sf_dir, classifier_weights={})
    assert neutral.count() == base_rows

    # hostile bias: every doc scores sigmoid(-5) < 0.5 -> nothing survives
    hostile = curate_and_prepare(
        spark, sf_dir, classifier_weights={}, classifier_bias=-5.0
    )
    assert hostile.count() == 0

    # span stripping with k far above any repeated run in this corpus is a
    # no-op; with a small k the pipeline still composes end-to-end
    same = curate_and_prepare(spark, sf_dir, strip_dup_spans_k=60)
    assert same.count() == base_rows
    stripped = curate_and_prepare(spark, sf_dir, strip_dup_spans_k=8)
    assert stripped.columns == base.columns
    assert stripped.count() > 0


def test_curate_and_prepare_semantic_stage(spark, sf_dir):
    """Semantic dedup composes into the front-end: on the isotropic driver
    corpus a 0.9 threshold finds no embedding groups (no-op), and lowering
    the threshold can only shrink the kept set."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
        prepare_training_corpus,
    )

    base = prepare_training_corpus(spark, sf_dir)
    base_rows = base.count()
    noop = curate_and_prepare(spark, sf_dir, semantic_threshold=0.9)
    assert noop.count() == base_rows
    aggressive = curate_and_prepare(spark, sf_dir, semantic_threshold=0.2)
    assert aggressive.columns == base.columns
    assert aggressive.count() <= base_rows


def test_semantic_stage_keeps_docs_without_embeddings(spark, sf_dir, tmp_path):
    """Regression: the embeddings table may cover only a SUBSET of the
    corpus (at sf0.1 the driver ships 5000 docs but 2000 vectors).  The
    semantic stage must drop only confirmed non-canonical members — docs
    with no embeddings row pass through untouched."""
    import os
    import shutil

    import duckdb

    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
        prepare_training_corpus,
    )

    scratch = str(tmp_path / "sf_subset")
    os.makedirs(scratch)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{scratch}/{t}.parquet")
    duckdb.connect().execute(
        f"COPY (SELECT * FROM '{sf_dir}/embeddings.parquet'"
        f" WHERE vec_id < 250)"
        f" TO '{scratch}/embeddings.parquet' (FORMAT PARQUET)"
    )
    base = prepare_training_corpus(spark, scratch).count()
    got = curate_and_prepare(spark, scratch, semantic_threshold=0.9).count()
    # isotropic corpus: zero semantic groups -> the stage must be a no-op
    # even though half the docs have no embedding
    assert got == base


def test_curate_and_prepare_all_stages_compose(spark, sf_dir):
    """Every opt-in stage enabled at once — guards stage INTERACTION (each
    stage consumes the previous stage's filtered/rewritten docs)."""
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.operators.curation import (
        stratum_counts,
        temperature_mix_rates,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter("doc_id < 3").selectExpr("doc_id AS bench_id", "text")
    rates = temperature_mix_rates(stratum_counts(d), alpha=0.5)
    out = curate_and_prepare(
        spark,
        sf_dir,
        benchmark=bench,
        contamination_frac=0.5,
        max_dup_gram_frac=0.9,
        mix_rates=rates,
        redact=True,
        strip_dup_spans_k=20,
        classifier_weights={},
        classifier_floor=0.4,
        semantic_threshold=0.9,
    )
    rows = out.collect()
    assert len(rows) > 0
    # the contaminated docs are gone even after every other stage ran
    kept = {r["doc_id"] for r in rows}
    assert not (kept & {0, 1, 2})


# ---------------------------------------------------------------------------
# URL / domain extraction
# ---------------------------------------------------------------------------


def test_extract_urls_and_domain_stats(spark):
    from hive_serde_schema_gen_spark.operators.curation import (
        domain_stats,
        extract_urls,
    )

    docs = spark.createDataFrame(
        [
            (1, "see https://www.Example.com/a?q=1 and http://sub.other.org/p"),
            (2, "dup link https://example.com/b (https://example.com/b) end"),
            (3, "no links here"),
            (4, "auth http://user:pw@Example.com/x and https://example.com:8080/y"),
        ],
        "doc_id long, text string",
    )
    rows = extract_urls(docs).collect()
    got = {(r["doc_id"], r["url"], r["domain"]) for r in rows}
    assert (1, "https://www.Example.com/a?q=1", "example.com") in got
    assert (1, "http://sub.other.org/p", "sub.other.org") in got
    # trailing ')' must not ride along; both occurrences counted
    assert sum(1 for r in rows if r["doc_id"] == 2) == 2
    assert all(r["url"] == "https://example.com/b" for r in rows if r["doc_id"] == 2)
    # userinfo and port stripped from the domain key
    assert {(d) for (i, u, d) in got if i == 4} == {"example.com"}
    assert not any(r["doc_id"] == 3 for r in rows)

    stats = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in domain_stats(docs).collect()}
    assert stats["example.com"] == (5, 3)
    assert stats["sub.other.org"] == (1, 1)


def test_extract_urls_narrow_and_no_python(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.curation import extract_urls
    from hive_serde_schema_gen_spark.plans.explain import (
        assert_no_python_udf,
        explain_str,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    df = extract_urls(load_table(spark, sf_dir, "documents"))
    assert_no_python_udf(df)
    assert "Exchange" not in explain_str(df)
    df.count()  # runs on real data without error


# ---------------------------------------------------------------------------
# Mixture materialization (upsampling with fractional repeats)
# ---------------------------------------------------------------------------


def _mix_corpus(spark, n=400):
    rows = [
        (i, "wiki" if i % 4 == 0 else "web", f"doc {i} text")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_materialize_integer_rate_exact_epochs(spark):
    from hive_serde_schema_gen_spark.operators.curation import materialize_mixture

    d = _mix_corpus(spark)
    out = materialize_mixture(d, {"wiki": 2.0}).collect()
    n_wiki = d.filter("source = 'wiki'").count()
    assert len(out) == 2 * n_wiki
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(e) == [1, 2] for e in per_doc.values())
    # unlisted stratum (web) dropped entirely
    assert all(r["source"] == "wiki" for r in out)


def test_materialize_fractional_rate_deterministic_and_accurate(spark):
    from hive_serde_schema_gen_spark.operators.curation import materialize_mixture

    d = _mix_corpus(spark, n=2000)
    out = materialize_mixture(d, {"web": 2.5})
    got = out.count()
    n_web = d.filter("source = 'web'").count()
    assert 2 * n_web <= got <= 3 * n_web
    assert abs(got - 2.5 * n_web) < 0.1 * n_web  # hash threshold ≈ rate
    assert out.count() == got  # deterministic re-run


def test_materialize_subunit_rate_matches_stratified_sample(spark):
    from hive_serde_schema_gen_spark.operators.curation import (
        materialize_mixture,
        stratified_sample,
    )

    d = _mix_corpus(spark, n=1000)
    rates = {"wiki": 1.0, "web": 0.3}
    filt = {r["doc_id"] for r in stratified_sample(d, rates).collect()}
    mat = [r for r in materialize_mixture(d, rates).collect()]
    assert {r["doc_id"] for r in mat} == filt
    assert all(r["epoch"] == 1 for r in mat)


def test_uncapped_temperature_rates_hit_target_shares(spark):
    from hive_serde_schema_gen_spark.operators.curation import (
        materialize_mixture,
        temperature_mix_rates,
    )

    counts = {"wiki": 500, "web": 1500}
    rates = temperature_mix_rates(counts, alpha=0.0, total=4000, max_rate=None)
    assert rates["wiki"] == pytest.approx(4.0)  # 2000/500 — upsampling
    assert rates["web"] == pytest.approx(2000 / 1500)
    d = _mix_corpus(spark, n=2000)  # 500 wiki / 1500 web
    got = {
        r["source"]: r["n"]
        for r in materialize_mixture(d, rates)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["wiki"] == 2000  # integer rate → exact
    assert abs(got["web"] - 2000) < 150  # fractional → approximate


def test_materialize_no_python_udf(spark):
    from hive_serde_schema_gen_spark.operators.curation import materialize_mixture
    from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

    assert_no_python_udf(materialize_mixture(_mix_corpus(spark), {"wiki": 2.5}))


def test_curate_and_prepare_boilerplate_and_expectations(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.operators.validation import (
        ValidationError,
        row_count,
        uniqueness,
    )

    base = curate_and_prepare(spark, sf_dir, hash_fn="xxhash64")
    out = curate_and_prepare(
        spark,
        sf_dir,
        strip_boilerplate_min_docs=5,
        expectations=[row_count(10), uniqueness("doc_id", approx=False)],
        hash_fn="xxhash64",
    )
    # the synthetic docs are single-line; min_docs=5 flags whole-doc texts
    # shared by >=5 docs, so the stage can only shrink the survivor set
    assert 0 < out.count() <= base.count()

    with pytest.raises(ValidationError, match="row_count"):
        curate_and_prepare(
            spark,
            sf_dir,
            expectations=[row_count(10**9)],
            hash_fn="xxhash64",
        )


def test_take_per_stratum_exact_nested_stable(spark):
    from hive_serde_schema_gen_spark.operators.curation import take_per_stratum

    d = _mix_corpus(spark, n=400)  # 100 wiki / 300 web
    s50 = take_per_stratum(d, 50)
    counts = {r["source"]: r["n"] for r in s50.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"wiki": 50, "web": 50}
    # exact even when k exceeds a stratum
    tiny = take_per_stratum(d.filter("doc_id < 10"), 50)
    assert tiny.count() == 10
    # deterministic + nested: the k=20 pick is a subset of the k=50 pick
    ids50 = {r["doc_id"] for r in s50.collect()}
    ids20 = {r["doc_id"] for r in take_per_stratum(d, 20).collect()}
    assert ids20 < ids50
    assert {r["doc_id"] for r in take_per_stratum(d, 50).collect()} == ids50
    # adding rows to web never disturbs wiki's pick
    wiki50 = {i for i in ids50 if i % 4 == 0}
    d2 = d.union(spark.createDataFrame([(10_000 + i, "web", "x") for i in range(100)], d.schema))
    ids2 = {r["doc_id"] for r in take_per_stratum(d2, 50).collect() if r["source"] == "wiki"}
    assert ids2 == wiki50


def test_canonical_url(spark):
    from hive_serde_schema_gen_spark.operators.curation import canonical_url
    from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf

    cases = [
        # variants of one resource all collapse to one canonical form
        ("HTTP://Example.com:80/a?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
        ("http://example.com/a?a=1&b=2", "http://example.com/a?a=1&b=2"),
        ("https://Example.COM:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        # path case is preserved; non-default port kept
        ("https://h.io:8443/CaseSensitive", "https://h.io:8443/CaseSensitive"),
        # non-URL passes through trimmed
        ("  not a url  ", "not a url"),
    ]
    d = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i int, u string")
    out = d.select("i", canonical_url(F.col("u")).alias("c"))
    assert_no_python_udf(out)
    got = {r["i"]: r["c"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_semantic_contamination(spark, sf_dir):
    import numpy as np

    from hive_serde_schema_gen_spark.operators.curation import (
        semantic_contamination,
    )
    from hive_serde_schema_gen_spark.plans.explain import explain_str
    from hive_serde_schema_gen_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    # benchmark = 3 corpus vectors verbatim + 1 slightly perturbed copy
    ids = sorted(vecs)[:4]
    bench = [
        (100 + i, (vecs[v] + (0.001 * (i == 3))).tolist()) for i, v in enumerate(ids)
    ]
    b = spark.createDataFrame(bench, "vec_id long, embedding array<double>")

    flagged = semantic_contamination(e, b, threshold=0.999)
    got = {r["vec_id"]: r for r in flagged.collect()}
    assert set(got) == set(ids)
    for i, v in enumerate(ids):
        assert got[v]["nearest_bench_id"] == 100 + i
        assert got[v]["max_bench_sim"] >= 0.999
    # oracle: numpy max-cos for one flagged vector
    bm = {bid: np.array(emb) for bid, emb in bench}
    def cos(a, c):
        return float(np.dot(a, c) / (np.linalg.norm(a) * np.linalg.norm(c)))
    want = max(cos(vecs[ids[0]], c) for c in bm.values())
    assert got[ids[0]]["max_bench_sim"] == pytest.approx(want, abs=1e-9)
    # scale posture: the benchmark side broadcasts
    assert "Broadcast" in explain_str(flagged)


def test_curate_and_prepare_semantic_decontamination(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    # benchmark = verbatim copies of two corpus embeddings
    bench = e.filter("vec_id IN (0, 1)").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )
    base = curate_and_prepare(spark, sf_dir, hash_fn="xxhash64")
    out = curate_and_prepare(
        spark,
        sf_dir,
        benchmark_emb=bench,
        semantic_contamination_threshold=0.999,
        hash_fn="xxhash64",
    )
    base_ids = {r["doc_id"] for r in base.collect()}
    out_ids = {r["doc_id"] for r in out.collect()}
    # flagged docs vanish; every other base survivor remains.  (Strict
    # equality would be wrong: dropping a flagged doc can PROMOTE one of
    # its near-dups to canonical downstream, adding it to the output.)
    assert {0, 1} & out_ids == set()
    assert {0, 1} & base_ids != set()  # the filter actually changed something
    assert base_ids - {0, 1} <= out_ids


def test_corpus_diff(spark):
    from hive_serde_schema_gen_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed"), (4, "brand new")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["change"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "modified", 3: "removed", 4: "added"}
    # identical snapshots diff to nothing
    assert corpus_diff(old, old).count() == 0


def test_vocab_coverage(spark):
    from hive_serde_schema_gen_spark.operators.curation import vocab_coverage
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    d = spark.createDataFrame(
        [
            (1, "The cat sat"),          # all in vocab (case-folded)
            (2, "cat zorblax qux"),      # 2/3 OOV
            (3, ""),                     # empty doc
        ],
        "doc_id int, text string",
    )
    out = vocab_coverage(d, ["the", "cat", "sat", "dog"])
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_oov"] == 0 and got[1]["oov_rate"] == 0.0
    assert got[2]["n_tokens"] == 3 and got[2]["n_oov"] == 2
    assert got[2]["oov_rate"] == pytest.approx(2 / 3)
    assert got[3]["n_tokens"] == 0 and got[3]["oov_rate"] == 0.0
    assert "Broadcast" in explain_str(out)  # vocab broadcasts


def test_corpus_diff_null_text(spark):
    from hive_serde_schema_gen_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [(1, "now has text"), (2, None), (3, None)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["change"] for r in corpus_diff(old, new).collect()}
    # NULL→text and text→NULL are MODIFICATIONS, not add/remove; NULL→NULL
    # is unchanged
    assert got == {1: "modified", 2: "modified"}


def test_vocab_coverage_case_variant_vocab(spark):
    from hive_serde_schema_gen_spark.operators.curation import vocab_coverage

    d = spark.createDataFrame([(1, "the cat")], "doc_id int, text string")
    # case-variant duplicates in the vocab must not fan the join out
    out = vocab_coverage(d, ["The", "the", "THE", "cat"]).collect()[0]
    assert out["n_tokens"] == 2 and out["n_oov"] == 0


def test_semantic_contamination_lsh_prefilter_parity(spark, sf_dir):
    """The LSH-prefiltered path (exact_below=0 forces it) must agree with
    the exact crossJoin path: identical flagged ids, nearest ids, and
    sims for the planted verbatim/paraphrase benchmark items (cosine ~1
    pairs share every bucket, so their recall is deterministic), and NO
    false positives anywhere (candidates are exact-verified)."""
    import numpy as np

    from hive_serde_schema_gen_spark.operators.curation import (
        semantic_contamination,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    ids = sorted(vecs)[:4]
    bench = [
        (100 + i, (vecs[v] + (0.001 * (i == 3))).tolist())
        for i, v in enumerate(ids)
    ]
    b = spark.createDataFrame(bench, "vec_id long, embedding array<double>")

    exact = {
        r["vec_id"]: r
        for r in semantic_contamination(e, b, threshold=0.999).collect()
    }
    lsh = {
        r["vec_id"]: r
        for r in semantic_contamination(
            e, b, threshold=0.999, exact_below=0
        ).collect()
    }
    # no false positives: every LSH hit is an exact hit with the same sim
    for vid, r in lsh.items():
        assert vid in exact
        assert r["max_bench_sim"] == exact[vid]["max_bench_sim"]
        assert r["nearest_bench_id"] == exact[vid]["nearest_bench_id"]
    # planted items (verbatim + paraphrase) are all caught by the LSH path
    assert set(ids) <= set(lsh)
    # full parity on this corpus
    assert set(lsh) == set(exact)


def test_filter_by_domain_policy(spark):
    from hive_serde_schema_gen_spark.operators.curation import filter_by_domain

    d = spark.createDataFrame(
        [
            (1, "example.com"),
            (2, "blog.example.com"),
            (3, "spam.biz"),
            (4, "other.org"),
            (5, None),
        ],
        "doc_id long, source string",
    )
    ids = lambda df: sorted(r["doc_id"] for r in df.collect())  # noqa: E731
    # pure deny: named hosts (and subdomains) go, NULL stays
    assert ids(filter_by_domain(d, deny=["spam.biz"])) == [1, 2, 4, 5]
    # allow: only listed (+subdomains), NULL dropped
    assert ids(filter_by_domain(d, allow=["example.com"])) == [1, 2]
    # allow then deny: deny wins on the subdomain
    assert ids(
        filter_by_domain(d, allow=["example.com"], deny=["blog.example.com"])
    ) == [1]
    # exact-only matching
    assert ids(
        filter_by_domain(d, allow=["example.com"], include_subdomains=False)
    ) == [1]
    # no policy = no-op
    assert ids(filter_by_domain(d)) == [1, 2, 3, 4, 5]


def test_filter_by_domain_randomized_vs_python_reference(spark):
    """300 seeded-random (host, policy) scenarios vs an independent
    pure-Python implementation of the documented semantics — guards the
    suffix-probe rewrite against edge drift (dots, case, partial-label
    lookalikes such as notexample.com vs example.com)."""
    import random

    from hive_serde_schema_gen_spark.operators.curation import filter_by_domain

    rng = random.Random(7)
    labels = ["example", "spam", "blog", "www", "a", "bb", "notexample", "x2"]
    tlds = ["com", "org", "biz"]

    def host():
        if rng.random() < 0.05:
            return None
        n = rng.randint(1, 4)
        return ".".join(rng.choice(labels) for _ in range(n)) + "." + rng.choice(tlds)

    def policy():
        k = rng.randint(1, 4)
        return [
            ".".join(rng.choice(labels) for _ in range(rng.randint(1, 2)))
            + "."
            + rng.choice(tlds)
            for _ in range(k)
        ]

    def ref_match(h, doms, subs):
        if h is None:
            return False
        h = h.lower()
        for dom in {d.lower() for d in doms}:
            if h == dom or (subs and h.endswith("." + dom)):
                return True
        return False

    hosts = [host() for _ in range(300)]
    d = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, source string"
    ).localCheckpoint()
    for subs in (True, False):
        for _ in range(6):
            allow = policy() if rng.random() < 0.7 else None
            deny = policy() if rng.random() < 0.7 else None
            got = {
                r["doc_id"]
                for r in filter_by_domain(
                    d, allow=allow, deny=deny, include_subdomains=subs
                ).collect()
            }
            want = set()
            for i, h in enumerate(hosts):
                keep = True
                if allow:
                    keep = ref_match(h, allow, subs)
                if keep and deny:
                    keep = h is None or not ref_match(h, deny, subs)
                if keep:
                    want.add(i)
            assert got == want, (allow, deny, subs, sorted(got ^ want)[:5])


def test_semantic_contamination_strategy_flag(spark, sf_dir):
    """Round-9 review fix: forcing ``strategy='exact'``/``'lsh'`` must
    (a) produce the same result as the auto heuristic's matching path and
    (b) skip the eager bench_emb.count() job the heuristic needs —
    measured by job-group counting."""
    import numpy as np
    import pytest as _pt

    from hive_serde_schema_gen_spark.operators.curation import (
        semantic_contamination,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    rows = e.limit(50).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    ids = sorted(vecs)[:2]
    b = spark.createDataFrame(
        [(100 + i, vecs[v].tolist()) for i, v in enumerate(ids)],
        "vec_id long, embedding array<double>",
    )

    auto = sorted(
        map(tuple, semantic_contamination(e, b, threshold=0.999).collect())
    )
    forced = sorted(
        map(
            tuple,
            semantic_contamination(
                e, b, threshold=0.999, strategy="exact"
            ).collect(),
        )
    )
    assert auto == forced and len(forced) == 2

    lsh_auto = sorted(
        map(
            tuple,
            semantic_contamination(
                e, b, threshold=0.999, exact_below=0
            ).collect(),
        )
    )
    lsh_forced = sorted(
        map(
            tuple,
            semantic_contamination(
                e, b, threshold=0.999, strategy="lsh"
            ).collect(),
        )
    )
    assert lsh_auto == lsh_forced

    with _pt.raises(ValueError):
        semantic_contamination(e, b, strategy="bogus")

    # forced path runs fewer jobs than auto (no bench count)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs(group, **kw):
        sc.setJobGroup(group, group)
        try:
            semantic_contamination(e, b, threshold=0.999, **kw).count()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    j_auto = jobs("sc-auto")
    j_forced = jobs("sc-forced", strategy="exact")
    assert j_forced < j_auto, (j_forced, j_auto)


def test_canonical_url_strip_tracking(spark):
    from hive_serde_schema_gen_spark.operators.curation import canonical_url

    d = spark.createDataFrame(
        [
            (1, "https://ex.com/a?utm_source=tw&id=7&utm_campaign=x"),
            (2, "https://ex.com/a?id=7"),
            (3, "https://ex.com/a?gclid=abc123"),
            (4, "https://ex.com/a"),
            # ref= stripped only as a PARAMETER name, not a value substring
            (5, "https://ex.com/a?href=1"),
        ],
        "i int, u string",
    )
    out = {
        r["i"]: r["c"]
        for r in d.select(
            "i", canonical_url(F.col("u"), strip_tracking=True).alias("c")
        ).collect()
    }
    assert out[1] == out[2] == "https://ex.com/a?id=7"
    assert out[3] == out[4] == "https://ex.com/a"
    assert out[5] == "https://ex.com/a?href=1"
    # default mode unchanged: tracking params preserved (sorted)
    from hive_serde_schema_gen_spark.operators.curation import canonical_url as cu

    kept = d.filter("i = 1").select(cu(F.col("u")).alias("c")).collect()[0]["c"]
    assert "utm_source=tw" in kept


def test_dedup_by_url_collapses_tracking_variants(spark):
    from hive_serde_schema_gen_spark.operators.curation import dedup_by_url

    d = spark.createDataFrame(
        [
            (10, "https://ex.com/p?utm_source=a", "copy one"),
            (11, "https://EX.com:443/p?utm_source=b", "copy two"),
            (12, "https://ex.com/p?v=2", "different page"),
            (13, "https://other.org/p", "other site"),
        ],
        "doc_id long, url string, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_by_url(d).collect())
    assert kept == [10, 12, 13]  # smallest id per canonical URL survives


# ---------------------------------------------------------------------------
# Round-13: token-budgeted mixture sampling
# ---------------------------------------------------------------------------


def _tok_docs(spark, n=120, sources=("a", "b", "c")):
    rows = [
        (i, sources[i % len(sources)], "w " * (5 + i % 7))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_token_budget_mixture_exact_accounting(spark):
    from hive_serde_schema_gen_spark.operators.curation import (
        token_budget_mixture,
    )

    d = _tok_docs(spark)
    budgets = {"a": 50, "b": 10_000, "c": 0}
    sel = token_budget_mixture(d, budgets).collect()
    by_dom = {}
    for r in sel:
        by_dom.setdefault(r["source"], []).append(r)
    # fill-to-budget: 'a' lands in [50, 50 + max_doc_tokens)
    a_tokens = sum(r["n_tokens"] for r in by_dom["a"])
    assert 50 <= a_tokens < 50 + 12
    # every selected row's tok_before is the exact prefix (audit column):
    # re-derive by sorting a's selected+unselected docs by hash order
    a_sel = sorted(by_dom["a"], key=lambda r: r["tok_before"])
    run = 0
    for r in a_sel:
        assert r["tok_before"] == run or r["tok_before"] >= run
        run = r["tok_before"] + r["n_tokens"]
    # a domain bigger than its supply keeps everything
    b_total = sum(
        r["n_tokens"]
        for r in d.filter("source = 'b'").selectExpr(
            "size(filter(split(trim(text), '\\\\s+'), t -> t != '')) AS n_tokens"
        ).collect()
    )
    assert sum(r["n_tokens"] for r in by_dom["b"]) == b_total
    # budget 0 / unlisted domains select nothing
    assert "c" not in by_dom
    # deterministic: a second run selects the identical set
    again = token_budget_mixture(d, budgets).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, sel))


def test_token_budget_mixture_shard_prefix_equals_global(spark):
    """The distributed hash-range-shard prefix sum must equal a naive
    global per-domain cumulative sum in hash order (the packing-oracle
    equivalence, re-keyed)."""
    from pyspark.sql.window import Window as W

    from hive_serde_schema_gen_spark.operators.curation import (
        token_budget_mixture,
    )
    from hive_serde_schema_gen_spark.operators.packing import ws_token_count

    d = _tok_docs(spark, n=300, sources=("x", "y"))
    got = {
        (r["source"], r["doc_id"]): r["tok_before"]
        for r in token_budget_mixture(
            d, {"x": 10**9, "y": 10**9}
        ).collect()
    }
    h = F.xxhash64(F.lit("tokmix-v1"), F.col("doc_id"))
    naive = d.select(
        "doc_id", "source", ws_token_count().alias("n"), h.alias("hk")
    ).withColumn(
        "before",
        F.coalesce(
            F.sum("n").over(
                W.partitionBy("source")
                .orderBy("hk", "doc_id")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    want = {
        (r["source"], r["doc_id"]): r["before"] for r in naive.collect()
    }
    assert got == want


def test_integer_temperature_budgets(spark):
    from hive_serde_schema_gen_spark.operators.curation import (
        integer_temperature_budgets,
    )

    tot = {"big": 90_000, "mid": 10_000, "tiny": 100}
    b = integer_temperature_budgets(tot, 20_000)
    # α=0.5 flattens: big gets less than its natural 90% share
    assert b["big"] / 20_000 < 0.9
    assert b["big"] > b["mid"] > b["tiny"]
    # a small domain is never budgeted past its supply
    assert b["tiny"] <= 100
    # integer shares: floor(sqrt)
    import math

    z = sum(math.isqrt(t) for t in tot.values())
    assert b["mid"] == min(10_000, math.isqrt(10_000) * 20_000 // z)
    assert integer_temperature_budgets({}, 100) == {}
    assert integer_temperature_budgets({"a": 0}, 100) == {}


def test_curate_and_prepare_quality_top_and_near_dup_stages(spark, sf_dir):
    """Round-13 stages compose: per-source percentile selection thins
    every source to its top fraction, and fuzzy (near-dup) benchmark
    decontamination drops the planted leak."""
    from hive_serde_schema_gen_spark.operators.corpus import (
        curate_and_prepare,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base_rows = curate_and_prepare(spark, sf_dir).count()

    # neutral classifier + top-100% keeps everything (selection is a
    # per-source no-op at frac 1/1)
    all_kept = curate_and_prepare(
        spark, sf_dir, classifier_weights={}, quality_top_frac=(1, 1)
    )
    assert all_kept.count() == base_rows

    # top-20%: every source thinned but none erased (k >= 1 floor);
    # the neutral model ties every score, and ties are INCLUDED, so a
    # same-score source keeps all its docs — assert via the selection
    # operator's own report instead of raw counts
    from hive_serde_schema_gen_spark.operators.curation import (
        quality_top_fraction,
    )
    from hive_serde_schema_gen_spark.operators.text import classifier_score

    scored = classifier_score(docs, {}).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    _, report = quality_top_fraction(scored, 1, 5, score_col="score")
    assert report.filter("n_sel < 1").count() == 0

    # fuzzy decontamination: plant one benchmark item that is a lightly
    # perturbed copy of a real document -> that document is dropped,
    # everything else survives
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    perturbed = " ".join(
        ("zz" + t if i == 5 else t)
        for i, t in enumerate(victim["text"].split())
    )
    bench = spark.createDataFrame(
        [(1, perturbed)], "bench_id long, text string"
    )
    # the sf0.001 docs are ~23 tokens, so one perturbed word costs 3 of
    # ~21 shingles (Jaccard 0.75) — set the knob below that
    cleaned = curate_and_prepare(
        spark, sf_dir, benchmark_near=bench, near_dup_threshold=0.73
    )
    assert cleaned.filter(F.col("doc_id") == victim["doc_id"]).count() == 0
    assert cleaned.count() >= base_rows - 1  # only the leak drops


def test_integer_power_budgets_and_anneal_schedule():
    """Rational-α temperature budgets: exact integer nth-root shares,
    α=1/2 equals the isqrt path, α=1 is proportional, and lower α
    flattens the mix toward uniform."""
    import math
    import random

    from hive_serde_schema_gen_spark.operators.curation import (
        _integer_nth_root,
        anneal_temperature_schedule,
        integer_power_budgets,
        integer_temperature_budgets,
    )

    # exact nth root at perfect powers and their neighbors, plus fuzz
    for base in (2, 3, 7, 10, 123):
        for n in (2, 3, 4, 5):
            p = base**n
            assert _integer_nth_root(p, n) == base
            assert _integer_nth_root(p - 1, n) == base - 1
            assert _integer_nth_root(p + 1, n) == base
    rng = random.Random(7)
    for _ in range(200):
        x = rng.randrange(0, 10**18)
        n = rng.randrange(1, 6)
        r = _integer_nth_root(x, n)
        assert r**n <= x < (r + 1) ** n
    assert _integer_nth_root(4, 2) == 2 == math.isqrt(4)

    totals = {"web": 1_000_000, "code": 250_000, "books": 40_000}
    # alpha = 1/2 reproduces the isqrt variant exactly
    assert integer_power_budgets(
        totals, 100_000, 1, 2
    ) == integer_temperature_budgets(totals, 100_000)
    # alpha = 1: proportional (integer floor of the exact shares)
    prop = integer_power_budgets(totals, 129_000, 1, 1)
    z = sum(totals.values())
    for s, t in totals.items():
        assert prop[s] == min(t, t * 129_000 // z)
    # flattening: lower alpha gives the SMALLEST domain a larger share
    flat = integer_power_budgets(totals, 100_000, 1, 4)
    sqrtish = integer_power_budgets(totals, 100_000, 1, 2)
    assert flat["books"] > sqrtish["books"]
    assert flat["web"] < sqrtish["web"]

    sched = anneal_temperature_schedule(
        totals, 50_000, [(1, 1), (3, 4), (1, 2)]
    )
    assert len(sched) == 3
    # the anneal moves monotonically toward the flattened end
    assert sched[0]["web"] >= sched[1]["web"] >= sched[2]["web"]
    assert sched[0]["books"] <= sched[1]["books"] <= sched[2]["books"]
