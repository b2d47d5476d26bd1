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
