"""End-to-end product drive: `corpus.crawl_to_shards` — the ONE-CALL
composition from crawl-shaped documents to loader-ready training shards
(c4 lines → repetition filter → decontamination ×3 → classifier
percentile selection → PII redaction → token-budget mixture → manifest →
shard export), with per-stage accounting reconciliation and in-file
training-order checks on the written shards.

Runs on sf0.01 in the suite; set ``SPARK_GRAFT_E2E_SF_DIR`` to a larger
corpus (e.g. ``.scale_scratch/sf1``) to drive the full-scale run whose
wall time BASELINE.md records."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.corpus import crawl_to_shards
from hive_serde_schema_gen_spark.sources.tables import load_table

E2E_SF = os.environ.get("SPARK_GRAFT_E2E_SF_DIR", "/root/testdata/sf0.01")
TOTAL_TOKENS = int(os.environ.get("SPARK_GRAFT_E2E_TOKENS", "20000"))


def _crawl_shaped(spark):
    """The corpus ships single-line docs without terminal punctuation —
    C4 line rules would drop everything.  Plant a page per document
    (three content lines with terminal tails + one nav stub) so the c4
    stage has real work, keeping lang/source for the later stages."""
    d = load_table(spark, E2E_SF, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    page = F.concat_ws(
        "\n",
        F.concat(t, F.lit(" first line tail.")),
        F.lit("Home"),
        F.concat(t, F.lit(" second line tail!")),
        F.concat(t, F.lit(" third line tail?")),
    )
    return d.select("doc_id", page.alias("text"), "lang", "source")


def _config(spark, docs):
    from hive_serde_schema_gen_spark.operators.logreg import (
        split_weights,
        train_classifier,
    )

    bench = docs.filter(F.col("doc_id") % 101 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    emb = load_table(spark, E2E_SF, "embeddings")
    bench_emb = emb.filter(F.col("vec_id") % 97 == 11)
    labels = docs.select(
        "doc_id", (F.col("doc_id") % 2 == 0).cast("double").alias("y")
    )
    w = train_classifier(
        docs, labels, n_buckets=1 << 10, max_ngram=2, iters=2, lr=1.0
    )
    weights, bias = split_weights(w)
    return dict(
        total_tokens=TOTAL_TOKENS,
        epoch=3,
        context_len=128,
        n_shards=4,
        alpha=(1, 2),
        c4_lines=True,
        max_dup_gram_frac=0.95,
        benchmark=bench,
        benchmark_near=bench,
        benchmark_emb=bench_emb,
        semantic_contamination_threshold=0.995,
        classifier_weights=weights,
        classifier_bias=bias,
        quality_top_frac=(9, 10),
        redact=True,
    )


@pytest.fixture(scope="module")
def driven(spark, tmp_path_factory):
    docs = _crawl_shaped(spark).localCheckpoint()
    cfg = _config(spark, docs)
    out = str(tmp_path_factory.mktemp("e2e") / "shards")
    acct: list = []
    sel, budgets = crawl_to_shards(
        spark, E2E_SF, out, accounting=acct, docs=docs, **cfg
    )
    return docs, sel.localCheckpoint(), budgets, acct, out, cfg


def test_accounting_reconciles(driven):
    docs, sel, budgets, acct, out, cfg = driven
    stages = [s for s, _ in acct]
    # every enabled stage reports, in pipeline order
    assert stages == [
        "input", "c4_lines", "repetition", "decontam_ngram",
        "decontam_fuzzy", "decontam_semantic", "quality_top_frac",
        "redact", "curated", "selected",
    ]
    counts = dict(acct)
    assert counts["input"] == docs.count()
    # docs in = kept + dropped at every stage: counts never increase
    for (s1, c1), (s2, c2) in zip(acct, acct[1:]):
        assert c2 <= c1, f"{s2} grew the corpus: {c1} -> {c2}"
    # the drive is non-vacuous: curation kept a real fraction and
    # dropped something
    assert 0 < counts["curated"] < counts["input"]
    assert counts["selected"] == sel.count() > 0
    # redaction rewrites text, never drops documents
    assert counts["redact"] == counts["quality_top_frac"]


def test_budgets_and_prefix_audit(driven):
    docs, sel, budgets, acct, out, cfg = driven
    rows = sel.collect()
    assert set(budgets) >= {r["source"] for r in rows}
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["source"], []).append(r)
    for dom, rs in by_dom.items():
        b = budgets[dom]
        rs.sort(key=lambda r: r["tok_before"])
        # selection invariant: every selected doc started under budget
        assert all(r["tok_before"] < b for r in rs)
        # the audit column is the exact hash-order token prefix
        run = 0
        for r in rs:
            assert r["tok_before"] == run
            run += r["n_tokens"]
        # fill-to-budget: realized tokens land under budget + one doc
        max_doc = max(r["n_tokens"] for r in rs)
        assert run < b + max_doc


def test_shards_are_loader_ready(driven):
    docs, sel, budgets, acct, out, cfg = driven
    files = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    shards = {os.path.basename(os.path.dirname(f)) for f in files}
    assert len(shards) == 4
    # one file per shard — the loader's unit of sequential work
    assert len(files) == 4
    n_rows = 0
    for f in files:
        t = pq.read_table(f).to_pandas()  # physical row order
        n_rows += len(t)
        # in-file training order with running token offsets: a loader
        # needs no sort and no index (the ADVICE r13 spill-stability fix
        # is what guarantees this survives the partitioned write)
        oh = list(t["order_hash"])
        assert oh == sorted(oh)
        off = 0
        for o, n in zip(t["offset"], t["n_tokens"]):
            assert o == off
            off += n
    assert n_rows == sel.count()


def test_rerun_is_replay_identical(spark, driven, tmp_path):
    docs, sel, budgets, acct, out, cfg = driven
    out2 = str(tmp_path / "shards2")
    sel2, budgets2 = crawl_to_shards(
        spark, E2E_SF, out2, docs=_crawl_shaped(spark), **cfg
    )
    assert budgets2 == budgets
    key = ["doc_id", "source", "n_tokens", "tok_before"]
    a, b = sel.select(*key), sel2.select(*key)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the exported shard files replay byte-level membership too
    ra = spark.read.parquet(out).select("doc_id", "shard", "offset")
    rb = spark.read.parquet(out2).select("doc_id", "shard", "offset")
    assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0
