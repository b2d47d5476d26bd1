"""DSIR importance resampling (`operators/dsir.py`) vs a pure-Python
reference (quantization mirrored), plus the selection-quality, prefit-
reuse, determinism, and plan contracts."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dsir import (
    dsir_sample,
    dsir_weights,
    fit_hash_counts,
    hashed_gram_tf,
)
from hive_serde_schema_gen_spark.plans.explain import (
    assert_no_python_udf,
    has_node,
)

M = 64
SALT = "dsir-v1"
SEED = "dsir-seed"


# --- pure-Python mirror (no shared code with the Spark path) -----------


def _md5_int(prefix: str, s: str, nhex: int) -> int:
    return int(hashlib.md5((prefix + "|" + s).encode()).hexdigest()[:nhex], 16)


def _py_grams(text: str) -> list:
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(g: str) -> int:
    return _md5_int(SALT, g, 8) % M


def _py_counts(texts):
    c = Counter()
    for t in texts:
        c.update(_py_bucket(g) for g in _py_grams(t))
    return c, sum(c.values())


def _py_logw(text, pc, pt, qc, qt):
    tf = Counter(_py_bucket(g) for g in _py_grams(text))
    total = 0
    for b, n in tf.items():
        r = (
            math.log(pc.get(b, 0) + 1)
            - math.log(pt + M)
            - math.log(qc.get(b, 0) + 1)
            + math.log(qt + M)
        )
        total += round(round(r, 9) * 10**9) * n
    return sum(tf.values()), total / 10**9


def _py_gumbel(doc_id: int) -> float:
    u = (_md5_int(SEED, str(doc_id), 13) % (1 << 52) + 0.5) / float(1 << 52)
    return round(-math.log(-math.log(u)), 9)


RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices fell sharply today"),
    (2, "the dog sat on the log"),
    (3, "quarterly earnings beat market expectations"),
    (4, "a cat and a dog met on a mat"),
    (5, "central bank raises interest rates again"),
    (6, "single"),
    (7, "   "),  # no grams -> logw 0
]
TARGET = [
    (100, "the cat sat by the dog"),
    (101, "a mat for the cat and the dog"),
    (102, "the dog and the cat sat together"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def test_weights_match_python_reference(spark, raw, target):
    pc, pt = _py_counts([t for _, t in TARGET])
    qc, qt = _py_counts([t for _, t in RAW])
    got = {
        r["doc_id"]: r
        for r in dsir_weights(raw, target, m=M, hash_fn="md5").collect()
    }
    assert len(got) == len(RAW)
    for doc_id, text in RAW:
        n, logw = _py_logw(text, pc, pt, qc, qt)
        assert got[doc_id]["n_grams"] == n, doc_id
        assert got[doc_id]["logw_q9"] == pytest.approx(logw, abs=1e-12), doc_id


def test_sample_matches_python_reference(spark, raw, target):
    pc, pt = _py_counts([t for _, t in TARGET])
    qc, qt = _py_counts([t for _, t in RAW])
    keys = []
    for doc_id, text in RAW:
        _, logw = _py_logw(text, pc, pt, qc, qt)
        g = _py_gumbel(doc_id)
        # both terms live on the 1e-9 grid -> integer arithmetic is exact
        key = round(logw * 10**9) + round(g * 10**9)
        keys.append((-key, doc_id, logw, g))
    keys.sort()
    want = [(d, lw, g) for _, d, lw, g in keys[:4]]

    rows = dsir_sample(raw, target, k=4, m=M, hash_fn="md5").collect()
    assert [r["sel_rank"] for r in rows] == [1, 2, 3, 4]
    got = [(r["doc_id"], r["logw_q9"], r["gumbel_q9"]) for r in rows]
    for (wd, wl, wg), (gd, gl, gg) in zip(want, got):
        assert wd == gd
        assert gl == pytest.approx(wl, abs=1e-12)
        assert gg == pytest.approx(wg, abs=1e-12)


def test_selection_prefers_target_like_docs(spark):
    # production config: target is feline prose, raw is half feline /
    # half finance -- the selected half must be overwhelmingly feline
    feline = [
        (i, f"the cat sat on the mat and the dog slept variant {i}")
        for i in range(20)
    ]
    finance = [
        (i + 100, f"stock market earnings interest rates report {i}")
        for i in range(20)
    ]
    raw = spark.createDataFrame(feline + finance, "doc_id long, text string")
    # target must carry enough gram mass relative to m for the fitted
    # model to beat the smoothing floor (module-docstring caveat)
    target = spark.createDataFrame(
        [
            (900 + i, f"a cat and a dog sat on the mat sample {i}")
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    picked = {
        r["doc_id"] for r in dsir_sample(raw, target, k=20, m=256).collect()
    }
    assert len(picked) == 20
    assert len([d for d in picked if d < 100]) >= 18


def test_prefit_model_reuse_equals_inline(spark, raw, target):
    kw = dict(m=M, hash_fn="md5")
    prefit_t = fit_hash_counts(target, **kw)
    prefit_q = fit_hash_counts(raw, **kw)
    inline = dsir_weights(raw, target, **kw).collect()
    reused = dsir_weights(raw, prefit_t, raw_model=prefit_q, **kw).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, reused))


def test_empty_doc_gets_zero_weight(spark, raw, target):
    got = {r["doc_id"]: r for r in dsir_weights(raw, target, m=M).collect()}
    assert got[7]["n_grams"] == 0
    assert got[7]["logw_q9"] == 0.0


def test_determinism_across_repartition(spark, raw, target):
    a = dsir_sample(raw, target, k=5, m=M).collect()
    b = dsir_sample(
        raw.repartition(7), target.repartition(3), k=5, m=M
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_plan_contracts(spark, raw, target):
    w = dsir_weights(raw, target, m=M)
    assert_no_python_udf(w)
    # model tables ride broadcast joins; the corpus is never broadcast
    assert has_node(w, "BroadcastHashJoin") or has_node(
        w, "BroadcastNestedLoopJoin"
    )
    s = dsir_sample(raw, target, k=3, m=M)
    assert_no_python_udf(s)
    assert has_node(s, "TakeOrderedAndProject")


def test_tf_is_bucket_counts(spark, raw):
    tf = hashed_gram_tf(raw, m=M, hash_fn="md5").collect()
    want = Counter()
    for doc_id, text in RAW:
        for g in _py_grams(text):
            want[(doc_id, _py_bucket(g))] += 1
    got = {(r["doc_id"], r["b"]): r["tf"] for r in tf}
    assert got == dict(want)


def test_curate_and_prepare_dsir_stage(spark):
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    d = load_table(spark, sf_dir, "documents")
    target = d.filter("lang = 'zh'")
    picked = {
        r["doc_id"]
        for r in dsir_sample(d, target, k=200, m=512).collect()
    }
    manifest = curate_and_prepare(
        spark, sf_dir, dsir_target=target, dsir_k=200, dsir_m=512
    )
    out_ids = {r["doc_id"] for r in manifest.select("doc_id").collect()}
    # pipeline tail dedups further, but every survivor was DSIR-selected
    assert out_ids <= picked
    assert len(out_ids) > 0


def test_curate_and_prepare_dsir_requires_k(spark):
    from hive_serde_schema_gen_spark.operators.corpus import curate_and_prepare
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    target = load_table(spark, sf_dir, "documents").limit(5)
    with pytest.raises(ValueError):
        curate_and_prepare(spark, sf_dir, dsir_target=target)


def test_slot_frames_match_standalone_arms(spark):
    """Round-18 sharing: dsir_slot_frames derives both driver arms from
    ONE materialized gram pass (raw model = tf summed per bucket, target
    model = tf restricted to the zh doc ids) — rows must be identical to
    the standalone per-arm builders that fit everything from scratch."""
    from hive_serde_schema_gen_spark.operators.dsir import (
        dsir_selected_rows,
        dsir_slot_frames,
        dsir_weight_rows,
    )

    sf_dir = "/root/testdata/sf0.001"
    w_new, sel_new = dsir_slot_frames(spark, sf_dir)
    assert sorted(map(tuple, w_new.collect())) == sorted(
        map(tuple, dsir_weight_rows(spark, sf_dir).collect())
    )
    assert sorted(map(tuple, sel_new.collect())) == sorted(
        map(tuple, dsir_selected_rows(spark, sf_dir).collect())
    )
