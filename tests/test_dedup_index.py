"""Persisted MinHash index: build → probe → extend round-trip, parity with
the batch LSH path, meta pinning, and the broadcast probe plan."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_index,
    extend_minhash_index,
    novel_docs,
)
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf


def _doc(i, words):
    return (i, " ".join(words))


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhidx") / "idx")
    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 1
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "red orange yellow green blue indigo violet pink brown black"),
        ],
        "doc_id int, text string",
    )
    build_minhash_index(corpus, path, n_files=2)
    del base
    return path, corpus


def test_probe_finds_exact_and_near_dup(spark, index):
    path, _ = index
    batch = spark.createDataFrame(
        [
            # exact copy of doc 1
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # near-dup of doc 2: one word appended (J = 8/10 of shingles)
            (102, "one two three four five six seven eight nine ten eleven"),
            # fresh document
            (103, "totally novel content nothing shared with any indexed doc"),
        ],
        "doc_id int, text string",
    )
    got = dedup_against_index(batch, path).collect()
    by_doc = {(r["doc_id"], r["matched_doc_id"]): r["est_jaccard"] for r in got}
    assert by_doc[(101, 1)] == 1.0
    assert (102, 2) in by_doc and by_doc[(102, 2)] >= 0.8
    assert not any(d == 103 for d, _ in by_doc)
    surv = sorted(r["doc_id"] for r in novel_docs(batch, _df(spark, got)).collect())
    assert surv == [103]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, matched_doc_id int, est_jaccard double"
    )


def test_extend_makes_novel_doc_findable(spark, index):
    path, _ = index
    fresh = spark.createDataFrame(
        [(103, "totally novel content nothing shared with any indexed doc")],
        "doc_id int, text string",
    )
    extend_minhash_index(fresh, path)
    probe = spark.createDataFrame(
        [(201, "totally novel content nothing shared with any indexed doc")],
        "doc_id int, text string",
    )
    got = dedup_against_index(probe, path).collect()
    assert {(r["doc_id"], r["matched_doc_id"]) for r in got} == {(201, 103)}
    assert got[0]["est_jaccard"] == 1.0


def test_meta_pinning_rejects_mismatched_index(spark, index, tmp_path):
    path, corpus = index
    # corrupt the meta: pretend the index used different banding
    bad = str(tmp_path / "bad_idx")
    spark.read.parquet(f"{path}/bands").write.parquet(f"{bad}/bands")
    spark.read.parquet(f"{path}/sigs").write.parquet(f"{bad}/sigs")
    spark.createDataFrame(
        [(1, 32, 8, 3, "xxhash64")],
        "version int, n_hashes int, band_size int, shingle int, hash_fn string",
    ).write.parquet(f"{bad}/meta")
    with pytest.raises(ValueError, match="rebuild the index"):
        dedup_against_index(corpus, bad)


def test_probe_plan_broadcasts_batch_and_no_udf(spark, index):
    path, _ = index
    batch = spark.createDataFrame(
        [(301, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    out = dedup_against_index(batch, path)
    assert_no_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # index side never shuffles


def test_probe_matches_batch_lsh_on_same_corpus(spark, index, tmp_path):
    """Index-probe of corpus B against corpus A must find the same cross
    pairs the batch self-join finds on A ∪ B (restricted to cross pairs,
    up to the estimated-vs-exact verification)."""
    from hive_serde_schema_gen_spark.operators.dedup import minhash_lsh_pairs

    path, corpus = index
    batch = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (102, "one two three four five six seven eight nine ten eleven"),
        ],
        "doc_id int, text string",
    )
    union = corpus.union(batch)
    batch_pairs = {
        (r["doc_b"], r["doc_a"])
        for r in minhash_lsh_pairs(
            spark, None, hash_fn="xxhash64", docs=union, sort=False
        ).collect()
        if r["doc_b"] >= 100 and r["doc_a"] < 100  # cross pairs only
    }
    idx_pairs = {
        (r["doc_id"], r["matched_doc_id"])
        for r in dedup_against_index(batch, path).collect()
    }
    assert batch_pairs == idx_pairs


def test_md5_index_probes_under_pinned_hash(spark, tmp_path):
    """An index built with hash_fn='md5' (the oracle configuration) must
    probe under md5 automatically — the probe reads the pinned hash from
    meta, so exact duplicates still match 16/16 and an unknown hash_fn in
    meta fails loudly."""
    path = str(tmp_path / "md5_idx")
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id int, text string",
    )
    build_minhash_index(corpus, path, n_files=2, hash_fn="md5")
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta["hash_fn"] == "md5"
    batch = spark.createDataFrame(
        [(101, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    rows = dedup_against_index(batch, path).collect()
    assert [(r["doc_id"], r["matched_doc_id"], r["est_jaccard"]) for r in rows] == [
        (101, 1, 1.0)
    ]
    # extend inherits the pinned hash: the extended doc is findable
    extend_minhash_index(
        spark.createDataFrame(
            [(3, "red orange yellow green blue indigo violet pink brown")],
            "doc_id int, text string",
        ),
        path,
    )
    probe2 = spark.createDataFrame(
        [(102, "red orange yellow green blue indigo violet pink brown")],
        "doc_id int, text string",
    )
    assert dedup_against_index(probe2, path).collect()[0]["matched_doc_id"] == 3
    # a foreign hash_fn in meta is rejected, not silently mis-probed
    bad = str(tmp_path / "bad_hash_idx")
    spark.read.parquet(f"{path}/bands").write.parquet(f"{bad}/bands")
    spark.read.parquet(f"{path}/sigs").write.parquet(f"{bad}/sigs")
    spark.createDataFrame(
        [(2, 16, 4, 3, "sha999", None)],
        "version int, n_hashes int, band_size int, shingle int, "
        "hash_fn string, max_df double",
    ).write.parquet(f"{bad}/meta")
    with pytest.raises(ValueError, match="rebuild the index"):
        dedup_against_index(batch, bad)


# ---------------------------------------------------------------------------
# Round-12: Theta digest-sketch recrawl triage
# ---------------------------------------------------------------------------


def _tri_docs(spark, ids, tag=""):
    return spark.createDataFrame(
        [(i, f"doc {i} body {tag} alpha beta gamma delta") for i in ids],
        "doc_id long, text string",
    )


def test_recrawl_triage_estimates_seen_fraction(spark, tmp_path):
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        extend_minhash_index,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-idx")
    build_minhash_index(
        _tri_docs(spark, range(0, 40)), path, hash_fn="md5",
        digest_sketch=True,
    )
    extend_minhash_index(
        _tri_docs(spark, range(40, 80)), path, epoch=1, digest_sketch=True
    )
    # batch: 30 exact re-crawls (same ids → same text) + 10 new docs
    batch = _tri_docs(spark, range(50, 80)).unionAll(
        _tri_docs(spark, range(1000, 1010), tag="new")
    )
    tri = recrawl_triage(batch, path)
    # Theta is exact below ~4k distinct values at these sizes
    assert tri["batch_distinct"] == 40.0
    assert tri["seen"] == 30.0
    assert tri["seen_frac"] == 0.75


def test_recrawl_triage_replay_is_idempotent(spark, tmp_path):
    """Re-appending the SAME epoch's sketch (crash-replay) must not move
    the union — Theta set semantics."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        append_digest_sketch,
        build_minhash_index,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-replay")
    docs = _tri_docs(spark, range(0, 30))
    build_minhash_index(docs, path, hash_fn="md5", digest_sketch=True)
    before = recrawl_triage(_tri_docs(spark, range(0, 10)), path)
    append_digest_sketch(docs, path, epoch=0)  # replayed batch
    after = recrawl_triage(_tri_docs(spark, range(0, 10)), path)
    assert before == after


def test_compact_digest_sketches_preserves_triage(spark, tmp_path):
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        compact_digest_sketches,
        extend_minhash_index,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-compact")
    build_minhash_index(
        _tri_docs(spark, range(0, 25)), path, hash_fn="md5",
        digest_sketch=True,
    )
    for e in range(1, 4):
        extend_minhash_index(
            _tri_docs(spark, range(25 * e, 25 * (e + 1))), path,
            epoch=e, digest_sketch=True,
        )
    batch = _tri_docs(spark, range(90, 120))  # 10 seen, 20 novel
    before = recrawl_triage(batch, path)
    compact_digest_sketches(spark, path)
    rows = spark.read.parquet(f"{path}/theta").collect()
    assert len(rows) == 1  # folded to one union row
    assert recrawl_triage(batch, path) == before


def test_ingest_recrawl_keeps_sketch_complete_without_triage(
    spark, tmp_path
):
    """Round 13: a triage=False ingest must still fold its batch into the
    theta artifact (default digest_sketch=None = 'artifact exists'), so a
    later triage sees the full corpus — not an undercounted seen_frac."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        ingest_recrawl,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-ingest")
    build_minhash_index(
        _tri_docs(spark, range(0, 20)), path, hash_fn="md5",
        digest_sketch=True,
    )
    # ingest WITHOUT triage — the batch must still reach the sketch
    ingest_recrawl(
        _tri_docs(spark, range(100, 120), tag="b2"), path, triage=False,
        epoch=1,
    )
    tri = recrawl_triage(_tri_docs(spark, range(100, 120), tag="b2"), path)
    assert tri["seen"] == 20.0 and tri["seen_frac"] == 1.0
    # and an index with NO artifact never grows one implicitly
    bare = str(tmp_path / "tri-bare")
    build_minhash_index(_tri_docs(spark, range(0, 10)), bare, hash_fn="md5")
    ingest_recrawl(
        _tri_docs(spark, range(200, 210), tag="b3"), bare, triage=False
    )
    import os

    assert not os.path.exists(f"{bare}/theta")


def test_recrawl_triage_missing_artifact_errors(spark, tmp_path):
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-missing")
    build_minhash_index(
        _tri_docs(spark, range(0, 10)), path, hash_fn="md5"
    )  # digest_sketch left off
    with pytest.raises(ValueError, match="no digest-sketch artifact"):
        recrawl_triage(_tri_docs(spark, range(0, 5)), path)


def test_triage_gates_on_sketch_functions(spark, tmp_path, monkeypatch):
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        digest_sketch_frame,
        recrawl_triage,
    )

    monkeypatch.setattr(
        spark.catalog, "functionExists", lambda name: False
    )
    with pytest.raises(NotImplementedError, match="Spark >= 4.1"):
        digest_sketch_frame(_tri_docs(spark, range(3)))
    with pytest.raises(NotImplementedError, match="Spark >= 4.1"):
        recrawl_triage(_tri_docs(spark, range(3)), str(tmp_path / "x"))


def test_triage_null_text_counts_as_distinct(spark, tmp_path):
    """NULL text sketches as the sentinel digest, not as nothing."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        recrawl_triage,
    )

    path = str(tmp_path / "tri-null")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta one"), (2, None)],
        "doc_id long, text string",
    )
    build_minhash_index(corpus, path, hash_fn="md5", digest_sketch=True)
    batch = spark.createDataFrame(
        [(10, None), (11, "fresh words entirely new here")],
        "doc_id long, text string",
    )
    tri = recrawl_triage(batch, path)
    assert tri["batch_distinct"] == 2.0
    assert tri["seen"] == 1.0  # the NULL sentinel matched


def test_ingest_recrawl_composed(spark, tmp_path):
    """Triage report + probe + extend in one call; a second identical
    recrawl reports ~everything seen and admits nothing."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        ingest_recrawl,
    )

    path = str(tmp_path / "recrawl-idx")
    build_minhash_index(
        _tri_docs(spark, range(0, 40)), path, hash_fn="md5",
        digest_sketch=True,
    )
    batch = _tri_docs(spark, range(30, 50))  # 10 seen exactly, 10 new
    novel, rep = ingest_recrawl(batch, path, epoch=1)
    assert rep["n_batch"] == 20
    assert rep["triage"]["seen"] == 10.0
    # exact re-crawls match at est_jaccard 1.0; the new ids are admitted
    assert rep["n_novel"] == 10
    assert sorted(r["doc_id"] for r in novel.select("doc_id").collect()) == list(
        range(40, 50)
    )
    # replaying the same batch: everything now seen, nothing admitted
    novel2, rep2 = ingest_recrawl(batch, path, epoch=2)
    assert rep2["triage"]["seen_frac"] == 1.0
    assert rep2["n_novel"] == 0
