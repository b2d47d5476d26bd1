"""Best-fit document packing: capacity invariants, completeness,
truncation flags, determinism, and waste vs naive arrival-order packing."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.packing import (
    pack_documents_best_fit,
    padding_waste,
)

L = 100


def _docs(spark, lengths):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    rng = random.Random(5)
    lengths = [rng.choice([10, 30, 55, 70, 95]) for _ in range(500)] + [150, 250]
    return _docs(spark, lengths), lengths


def test_invariants(spark, skewed_corpus):
    d, lengths = skewed_corpus
    packed = pack_documents_best_fit(d, L).collect()
    # completeness: every doc exactly once, token counts preserved
    assert sorted(r["doc_id"] for r in packed) == list(range(len(lengths)))
    by_doc = {r["doc_id"]: r for r in packed}
    for i, n in enumerate(lengths):
        assert by_doc[i]["n_tokens"] == n
        assert by_doc[i]["truncated"] == (n > L)
    # capacity: non-truncated bins never exceed L
    fill = {}
    for r in packed:
        if not r["truncated"]:
            fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= L for v in fill.values())
    # oversized docs sit alone in their bins
    for r in packed:
        if r["truncated"]:
            assert sum(1 for q in packed if q["bin_id"] == r["bin_id"]) == 1


def test_deterministic(spark, skewed_corpus):
    d, _ = skewed_corpus
    a = sorted(map(tuple, pack_documents_best_fit(d, L).collect()))
    b = sorted(map(tuple, pack_documents_best_fit(d, L).collect()))
    assert a == b


def test_beats_naive_arrival_order(spark, skewed_corpus):
    d, lengths = skewed_corpus
    packed = pack_documents_best_fit(d, L)
    waste = padding_waste(packed, L)
    # naive baseline: first-fit in arrival order, single sequence
    bins, cur = 1, 0
    for n in lengths:
        n = min(n, L)
        if cur + n > L:
            bins += 1
            cur = n
        else:
            cur += n
    naive_waste = 1.0 - sum(min(n, L) for n in lengths) / (bins * L)
    assert waste < naive_waste
    # the 95-token docs force ≥5% waste each; 0.18 is near-optimal for
    # this mix (measured 0.158 vs naive 0.242)
    assert waste < 0.18


def test_exact_fit_zero_waste(spark):
    d = _docs(spark, [50, 50, 60, 40, 100])
    packed = pack_documents_best_fit(d, L)
    assert padding_waste(packed, L) == pytest.approx(0.0)
    assert packed.select("bin_id").distinct().count() == 3


def test_null_text_and_string_ids(spark):
    # NULL text packs as a 0-token doc (degrades, never crashes); string
    # ids survive with their type intact
    d = spark.createDataFrame(
        [("doc-a", "five words of real text"), ("doc-b", None), ("doc-c", "x")],
        "doc_id string, text string",
    )
    packed = pack_documents_best_fit(d, L).collect()
    by_id = {r["doc_id"]: r for r in packed}
    assert set(by_id) == {"doc-a", "doc-b", "doc-c"}
    assert by_id["doc-b"]["n_tokens"] == 0
    assert not by_id["doc-b"]["truncated"]
