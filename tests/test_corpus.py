"""End-to-end invariants of the composed corpus pipeline
(``operators/corpus.py``): survivors respect the quality gate and both
dedup stages, packing offsets are contiguous in corpus order, splits match
the md5 arithmetic, and the whole manifest is reproducible run-to-run."""


from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

import hashlib

from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.corpus import prepare_training_corpus
from hive_serde_schema_gen_spark.operators.text import text_quality_score
from hive_serde_schema_gen_spark.sources.tables import load_table

QUALITY_FLOOR = 0.3


def _manifest(spark, sf_dir):
    return prepare_training_corpus(
        spark, sf_dir, quality_floor=QUALITY_FLOOR
    ).collect()


def test_corpus_pipeline_invariants(spark, sf_dir):
    rows = _manifest(spark, sf_dir)
    assert rows, "pipeline produced an empty corpus"
    assert set(rows[0].asDict()) == {
        "doc_id", "n_tokens", "offset", "chunk_first", "chunk_last",
        "n_chunks", "split", "n_merged",
    }

    d = load_table(spark, sf_dir, "documents")
    scores = {
        r["doc_id"]: r["quality"]
        for r in text_quality_score(spark, sf_dir).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in d.collect()}

    ids = [r["doc_id"] for r in rows]
    # quality gate
    assert all(scores[i] >= QUALITY_FLOOR for i in ids)
    # exact dedup: no two survivors share content
    contents = [texts[i] for i in ids]
    assert len(set(contents)) == len(contents)

    # packing: offsets contiguous in doc_id order
    rows_sorted = sorted(rows, key=lambda r: r["doc_id"])
    assert ids == [r["doc_id"] for r in rows_sorted]  # output already ordered
    for prev, cur in zip(rows_sorted, rows_sorted[1:]):
        assert cur["offset"] == prev["offset"] + prev["n_tokens"]
    assert rows_sorted[0]["offset"] == 0

    # splits: pure md5 arithmetic of the id
    for r in rows:
        bucket = int(hashlib.md5(f"v1:{r['doc_id']}".encode()).hexdigest()[:8], 16) % 10000
        expected = "train" if bucket < 9800 else ("val" if bucket < 9900 else "test")
        assert r["split"] == expected, (r["doc_id"], bucket, r["split"])

    # dedup accounting: quality-passing, content-unique docs are either
    # survivors or absorbed by exactly one survivor
    passing = [i for i, s in scores.items() if s >= QUALITY_FLOOR]
    first_per_content: dict[str, int] = {}
    for i in sorted(passing):
        first_per_content.setdefault(texts[i], i)
    n_unique = len(first_per_content)
    assert n_unique == len(rows) + sum(r["n_merged"] for r in rows)
    assert all(r["n_merged"] >= 0 for r in rows)


def test_corpus_pipeline_reproducible(spark, sf_dir):
    a = [tuple(r) for r in _manifest(spark, sf_dir)]
    b = [tuple(r) for r in _manifest(spark, sf_dir)]
    assert a == b


def test_curate_and_prepare_html_front_end(spark, sf_dir, tmp_path):
    """html=True: a corpus whose text column is raw crawl HTML flows
    through the full pipeline — extraction runs first, so quality/dedup/
    packing see clean text, and planted HTML noise never reaches the
    output manifest."""
    import os
    import shutil

    import duckdb

    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare

    scratch = str(tmp_path / "sf_html")
    os.makedirs(scratch)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{scratch}/{t}.parquet")
    # wrap every document's text in an HTML page with script noise
    duckdb.connect().execute(
        f"""COPY (SELECT doc_id,
              '<html><body><script>junk()</script><p>' || text || '</p></body></html>' AS text,
              lang, source, n_chars
            FROM '{sf_dir}/documents.parquet')
            TO '{scratch}/documents.parquet' (FORMAT PARQUET)"""
    )
    plain = curate_and_prepare(spark, sf_dir, hash_fn="xxhash64")
    via_html = curate_and_prepare(spark, scratch, html=True, hash_fn="xxhash64")
    a = {(r["doc_id"], r["n_tokens"]) for r in plain.select("doc_id", "n_tokens").collect()}
    b = {(r["doc_id"], r["n_tokens"]) for r in via_html.select("doc_id", "n_tokens").collect()}
    # extraction recovers the original text, so the curated manifests match
    assert a == b
