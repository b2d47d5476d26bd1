"""Int8 scalar quantization for embedding storage
(`embedding.quantize_embeddings_int8` / `dequantize_embeddings_int8`):
roundtrip error bounded by scale/2, codes in [-127, 127], zero-vector
handling, cosine-ordering preservation on separated vectors, and a
JVM-only no-shuffle plan."""

from __future__ import annotations

import math

from hive_serde_schema_gen_spark.operators.embedding import (
    dequantize_embeddings_int8,
    quantize_embeddings_int8,
)

VECS = [
    (1, [0.5, -0.25, 0.125, 1.0]),
    (2, [1e-6, -1e-6, 0.0, 2e-6]),
    (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector
    (4, [-3.5, 2.25, 0.75, -0.125]),
]


def _df(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    )


def test_roundtrip_error_bounded_and_codes_in_range(spark):
    q = quantize_embeddings_int8(_df(spark))
    rows = {r["vec_id"]: r for r in q.collect()}
    for vid, vec in VECS:
        r = rows[vid]
        assert all(-127 <= c <= 127 for c in r["q"])
        assert math.isclose(
            r["scale"], max(abs(x) for x in vec) / 127.0, rel_tol=1e-6
        ) or r["scale"] == 0.0
    deq = {
        r["vec_id"]: r["embedding"]
        for r in dequantize_embeddings_int8(q).collect()
    }
    for vid, vec in VECS:
        scale = max(abs(x) for x in vec) / 127.0
        for orig, rec in zip(vec, deq[vid]):
            assert abs(orig - rec) <= scale / 2 + 1e-6


def test_zero_vector_roundtrips_to_zeros(spark):
    q = quantize_embeddings_int8(_df(spark))
    r = next(x for x in q.collect() if x["vec_id"] == 3)
    assert r["scale"] == 0.0 and all(c == 0 for c in r["q"])
    deq = {
        x["vec_id"]: x["embedding"]
        for x in dequantize_embeddings_int8(q).collect()
    }
    assert deq[3] == [0.0, 0.0, 0.0, 0.0]


def test_cosine_ordering_preserved(spark):
    import random

    rng = random.Random(42)
    base = [rng.gauss(0, 1) for _ in range(32)]
    nb = math.sqrt(sum(x * x for x in base))
    base = [x / nb for x in base]

    def _mix(eps):
        v = [b + eps * rng.gauss(0, 1) for b in base]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = [(i, _mix(0.05 * i)) for i in range(1, 9)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    deq = {
        r["vec_id"]: r["embedding"]
        for r in dequantize_embeddings_int8(
            quantize_embeddings_int8(df)
        ).collect()
    }

    def _cos(v):
        num = sum(a * b for a, b in zip(v, base))
        return num / math.sqrt(sum(x * x for x in v))

    exact_order = [v for v, _ in sorted(vecs, key=lambda p: -_cos(p[1]))]
    quant_order = sorted(deq, key=lambda k: -_cos(deq[k]))
    assert quant_order == exact_order


def test_plan_is_jvm_narrow(spark):
    from hive_serde_schema_gen_spark.plans.explain import (
        assert_no_python_udf,
    )

    out = dequantize_embeddings_int8(quantize_embeddings_int8(_df(spark)))
    assert_no_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
