"""Text normalization: control/zero-width stripping, whitespace collapse,
CRLF handling, case, opt-in NFC, and the dedup-recall motivation."""

from __future__ import annotations

import unicodedata

import pytest

from hive_serde_schema_gen_spark.operators.text import normalize_text
from hive_serde_schema_gen_spark.plans.explain import assert_no_python_udf


def _norm(spark, text, **kw):
    d = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return normalize_text(d, **kw).collect()[0]["text"]


def test_whitespace_and_case(spark):
    assert (
        _norm(spark, "  Hello\t\tWorld \r\n Second\rLine  ")
        == "hello world\nsecond\nline"
    )


def test_control_and_zero_width_stripped(spark):
    assert _norm(spark, "a\x00b​c﻿d\x1fe") == "abcde"
    # newline and tab survive the control strip (tab then collapses)
    assert _norm(spark, "a\tb\nc", collapse_whitespace=False) == "a\tb\nc"


def test_nfc_composes(spark):
    decomposed = unicodedata.normalize("NFD", "café")  # e + combining acute
    assert len(decomposed) == 5
    got = _norm(spark, decomposed, nfc=True)
    assert got == "café" and len(got) == 4


def test_collapses_digest_variants(spark):
    # the motivating property: variants of one document hash identically
    # after normalization
    variants = [
        "The Quick\r\nBrown Fox",
        "the quick\nbrown fox",
        "the  quick \n brown\tfox",
        "​The quick\nbrown fox  ",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(variants)], "doc_id int, text string"
    )
    texts = {r["text"] for r in normalize_text(d).collect()}
    assert texts == {"the quick\nbrown fox"}


def test_default_path_is_codegen_only(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    assert_no_python_udf(normalize_text(d))  # nfc off → no Arrow stage
    out = normalize_text(d, nfc=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # nfc on → the documented Arrow exception


def test_idempotent(spark):
    t = "  Mixed\tCASE \r\n with​ junk \x01 everywhere "
    once = _norm(spark, t)
    assert _norm(spark, once) == once


def test_edge_newlines_collapse(spark):
    # 'abc' and 'abc\n' (and '\nabc') must digest identically
    assert _norm(spark, "abc\n") == "abc"
    assert _norm(spark, "\n\nabc") == "abc"
    assert _norm(spark, " \nabc\n ") == "abc"
