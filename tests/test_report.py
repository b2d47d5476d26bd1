"""Corpus report: section values verified on a constructed corpus."""

from __future__ import annotations

import pytest

from hive_serde_schema_gen_spark.operators.report import corpus_report

A = " ".join(f"w{i}" for i in range(30))


@pytest.fixture(scope="module")
def report(spark):
    docs = spark.createDataFrame(
        [
            (1, A, "en", "wiki"),
            (2, A, "en", "web"),                      # exact dup of 1
            (3, A + " tail", "en", "web"),            # near dup of 1
            (4, "buy now " * 20, "en", "web"),        # template
            (5, "short text plus https://ex.org/a", "de", "web"),
        ],
        "doc_id int, text string, lang string, source string",
    )
    return corpus_report(docs)


def test_size_and_mixes(report):
    assert report["n_docs"] == 5
    assert report["lang_mix"] == {"en": 4, "de": 1}
    assert report["source_mix"] == {"wiki": 1, "web": 4}
    assert report["null_text_frac"] == 0.0
    assert report["text_len"]["min"] > 0


def test_dup_rates(report):
    assert report["exact_dup_frac"] == pytest.approx(1 / 5)  # doc 2
    # near-dup pass flags doc 3 (vs 1) and the exact copy too
    assert report["near_dup_frac"] >= 1 / 5


def test_repetition_and_domains(report):
    assert report["repetition"]["frac_templatey"] == pytest.approx(1 / 5)
    assert ("ex.org", 1) in report["top_domains"]


def test_quality_section(report):
    assert 0.0 <= report["quality"]["mean"] <= 1.0
    assert 0.0 <= report["quality"]["frac_low"] <= 1.0


def test_null_text_counts_as_one_content_class(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "real")], "doc_id int, text string"
    )
    rep = corpus_report(docs, near_dup=False)
    # 3 docs, 2 content classes (NULL, "real") → dup frac 1/3
    assert rep["exact_dup_frac"] == pytest.approx(1 / 3)


def test_mix_truncation_flag(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i}") for i in range(60)],
        "doc_id int, text string, lang string, source string",
    )
    rep = corpus_report(docs, near_dup=False)
    assert len(rep["source_mix"]) == 50 and rep["source_mix_truncated"]
    assert not rep["lang_mix_truncated"]


def test_report_rows_consistent_with_dict_report(spark, sf_dir):
    """corpus_report_rows is the driver-hashable subset of corpus_report —
    the numbers the two share must agree (same fragments underneath)."""
    from hive_serde_schema_gen_spark.operators.report import (
        corpus_report,
        corpus_report_rows,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = {
        r["metric"]: (r["n"], r["v"])
        for r in corpus_report_rows(d, hash_fn="xxhash64").collect()
    }
    rep = corpus_report(d)
    assert rows["n_docs"][0] == rep["n_docs"]
    assert rows["exact_dup_frac"][1] == rep["exact_dup_frac"]
    assert rows["n_near_dup"][0] == round(rep["near_dup_frac"] * rep["n_docs"])
    assert rows["len_min"][0] == rep["text_len"]["min"]
    assert rows["len_max"][0] == rep["text_len"]["max"]
    for lang, n in rep.get("lang_mix", {}).items():
        assert rows[f"lang:{lang}"][0] == n
    # quality mean from the exact-decimal sum tracks the float mean
    mean_q = rows["quality_sum_q9"][1] / rows["n_docs"][0]
    assert abs(mean_q - rep["quality"]["mean"]) < 1e-6
