"""Persisted BM25 postings index: bit-exact parity with the scan-time
form, term-pruned probe reads, and meta pinning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.text import bm25_topk
from hive_serde_schema_gen_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
)
from hive_serde_schema_gen_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25idx") / "idx")
    build_text_index(load_table(spark, sf_dir, "documents"), path, n_files=4)
    return path


def test_indexed_scores_bit_identical_to_scan_form(spark, sf_dir, index_path):
    d = load_table(spark, sf_dir, "documents")
    for q in ("spark join window", "table", "query scan batch value"):
        scan = [(r["doc_id"], r["bm25"]) for r in bm25_topk(d, q, k=15).collect()]
        idx = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk_indexed(spark, index_path, q, k=15).collect()
        ]
        assert scan == idx  # same docs, same order, bit-identical doubles


def test_probe_reads_prune_to_query_terms(spark, index_path):
    """The postings scan must push the term IN-filter to parquet — the
    mechanism that keeps a query from reading the vocabulary."""
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    plan = explain_str(bm25_topk_indexed(spark, index_path, "spark", k=5))
    assert "PushedFilters" in plan and "term" in plan


def test_meta_pin_rejects_foreign_index(spark, tmp_path):
    spark.createDataFrame(
        [(99, "other-tokenizer")], "version int, tokenizer string"
    ).write.parquet(f"{tmp_path}/idx/meta")
    with pytest.raises(ValueError, match="rebuild the index"):
        bm25_topk_indexed(spark, f"{tmp_path}/idx", "spark")


def test_empty_query_rejected(spark, index_path):
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk_indexed(spark, index_path, "   ")


def test_extend_matches_fresh_build_and_scan_form(spark, sf_dir, tmp_path):
    """Incremental ingest parity: build on half the corpus, extend with
    the other half — scores must be bit-identical to both a from-scratch
    build over the union AND the scan-time bm25_topk."""
    from hive_serde_schema_gen_spark.operators.text_index import (
        extend_text_index,
    )

    d = load_table(spark, sf_dir, "documents")
    half_a = d.filter("doc_id % 2 = 0")
    half_b = d.filter("doc_id % 2 = 1")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_text_index(half_a, inc, n_files=4)
    extend_text_index(half_b, inc)
    build_text_index(d, full, n_files=4)
    q = "spark join window"
    rows = lambda p: [  # noqa: E731
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(spark, p, q, k=15).collect()
    ]
    scan = [(r["doc_id"], r["bm25"]) for r in bm25_topk(d, q, k=15).collect()]
    assert rows(inc) == rows(full) == scan


def test_hybrid_retrieval_end_to_end(spark, sf_dir, index_path):
    """The full serve-path composition: persisted-BM25 lexical top-k +
    LSH-ANN dense top-k fused by reciprocal rank — the hybrid retrieval
    recipe the operator docstrings describe, run across three persisted/
    prebuilt artifacts (BM25 postings index, LSH buckets, embeddings)."""
    from hive_serde_schema_gen_spark.operators.similarity import (
        ann_topk_lsh,
        build_lsh_index,
    )
    from hive_serde_schema_gen_spark.operators.text import rrf_fuse

    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk_indexed(spark, index_path, "spark join window", k=10)
    dense = ann_topk_lsh(emb, 10, index=build_lsh_index(emb)).select(
        F.col("vec_id").alias("doc_id")
    )
    fused = rrf_fuse([lex.select("doc_id"), dense], k=60, topk=10)
    rows = fused.collect()
    assert len(rows) == 10
    # fused scores are descending and positive; a doc present in BOTH
    # lists (if any) outranks a doc of equal rank in one list
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    lex_ids = {r["doc_id"] for r in lex.collect()}
    dense_ids = {r["doc_id"] for r in dense.collect()}
    both = lex_ids & dense_ids
    fused_ids = [r["doc_id"] for r in rows]
    for b in both:
        assert b in fused_ids  # double-listed docs always survive fusion


def test_null_text_docs_probe_identically_to_scan_form(spark, tmp_path):
    """Review-found parity gap: NULL-text docs count into idf's N but
    must NOT count into avgdl's denominator (Spark's AVG skips them) —
    the index stats now record both counts, so a corpus containing
    NULL-text rows probes bit-identically to bm25_topk."""
    d = spark.createDataFrame(
        [
            (1, "spark joins data"),
            (2, "spark shuffles data frames"),
            (3, None),
            (4, "window functions in spark"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "nulidx")
    build_text_index(d, path, n_files=2)
    scan = [(r["doc_id"], r["bm25"]) for r in bm25_topk(d, "spark data", k=4).collect()]
    idx = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(spark, path, "spark data", k=4).collect()
    ]
    assert scan == idx
