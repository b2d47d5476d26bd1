"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidates from random-hyperplane buckets only).

Cross-engine exactness trick: float sums reassociate differently per engine,
so oracle-compared scores quantize each component to an integer
(``round(x * 10000)``) and compute integer dot products — order-independent
and bit-identical everywhere.  The quantization itself is deterministic:
``x * 10000`` of a float32 is an exact double (24-bit × 14-bit mantissas fit
in 53), and an exact .5 tie would need a denominator-625 rational, which no
binary float can be — so HALF_UP (Spark) vs HALF_EVEN (DuckDB) never
disagree.  Production path without an oracle would use the plain double
``functions.vector.cosine_similarity`` (same plan shape, no quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine_similarity
from ..registry import query
from ..sources.tables import load_table

QUERY_VEC_ID = 0  # the probe vector for top-k queries
SCALE = 10000
N_PLANES = 8  # random hyperplanes → 256 LSH buckets


def quantized(col) -> F.Column:
    """array<float> → array<long> with elements round(x*10000)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * SCALE).cast("long")
    )


def qdot(a, b) -> F.Column:
    """Exact integer dot product of two quantized vectors (fold order
    irrelevant for ints)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _quantized_cosine(vec_col, q_col) -> F.Column:
    dot = qdot(vec_col, q_col).cast("double")
    n1 = F.sqrt(qdot(vec_col, vec_col).cast("double"))
    n2 = F.sqrt(qdot(q_col, q_col).cast("double"))
    return dot / (n1 * n2)


_SQL_QUANT = (
    "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT)"
)


@query(
    "similarity_topk_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_SQL_QUANT} AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings),
    q AS (SELECT v AS qv, i FROM e WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
      SELECT e.vec_id,
             CAST(SUM(e.v * q.qv) AS DOUBLE) AS dot,
             CAST(SUM(e.v * e.v) AS DOUBLE) AS nv,
             CAST(SUM(q.qv * q.qv) AS DOUBLE) AS nq
      FROM e JOIN q USING (i) GROUP BY e.vec_id)
    SELECT vec_id, dot / (sqrt(nv) * sqrt(nq)) AS cos_sim
    FROM dots
    WHERE vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def similarity_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-10 for one probe vector.

    The probe is fetched once (2 KB) and inlined as a literal — on a cluster
    it rides the closure to every executor; no join, no shuffle: one narrow
    scan + TakeOrdered(k).  Scales linearly in corpus size; this is the
    baseline ANN implementations are verified against
    (``similarity_lsh_bucketed``)."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(quantized("embedding").alias("q"))
        .collect()[0]["q"]
    )
    qlit = F.array([F.lit(int(v)).cast("long") for v in qvec])
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            _quantized_cosine(quantized("embedding"), qlit).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "similarity_pairs_threshold",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, {_SQL_QUANT} AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id < 200),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(a.v * b.v) AS DOUBLE) AS dot,
             CAST(SUM(a.v * a.v) AS DOUBLE) AS na,
             CAST(SUM(b.v * b.v) AS DOUBLE) AS nb
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id)
    SELECT vec_a, vec_b, dot / (sqrt(na) * sqrt(nb)) AS cos_sim
    FROM pairs WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.9
    ORDER BY vec_a, vec_b
    """,
)
def similarity_pairs_threshold(spark, sf_dir):
    """Embedding-cosine near-dup pairs (≥0.9) over a bounded id range — the
    exact quadratic baseline.  The range bound keeps the demo pairwise join
    honest; the unbounded-scale version is the LSH-bucketed query."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", quantized("embedding").alias("qe"))
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = qdot(F.col("a.qe"), F.col("b.qe")).cast("double")
    na = qdot(F.col("a.qe"), F.col("a.qe")).cast("double")
    nb = qdot(F.col("b.qe"), F.col("b.qe")).cast("double")
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
        .orderBy("vec_a", "vec_b")
    )


@query(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           sqrt(CAST(SUM(v * v) AS DOUBLE)) / 10000 AS l2_norm
    FROM (SELECT vec_id, label, {_SQL_QUANT} AS v FROM embeddings)
    GROUP BY vec_id, label ORDER BY vec_id
    """,
)
def embedding_norms(spark, sf_dir):
    """Per-vector L2 norms (quantized-exact).  Norm precompute is the
    standard trick that turns cosine top-k into a single dot product per
    candidate at query time."""
    e = load_table(spark, sf_dir, "embeddings")
    q = quantized("embedding")
    return e.select(
        "vec_id",
        "label",
        (F.sqrt(qdot(q, q).cast("double")) / SCALE).alias("l2_norm"),
    ).orderBy("vec_id")


def _planes(dim: int = 64):
    """Deterministic pseudo-random hyperplanes from md5(plane,dim) — no RNG
    state, reproducible across runs and engines."""
    import hashlib

    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col) -> F.Column:
    """Random-hyperplane LSH bucket id: sign bit per plane → 8-bit bucket."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, plane in enumerate(_planes()):
        plit = F.array([F.lit(w) for w in plane])
        d = F.aggregate(
            F.zip_with(c, plit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


@query("similarity_lsh_bucketed", oracle=None)
def similarity_lsh_bucketed(spark, sf_dir):
    """ANN via random-hyperplane LSH: vectors bucketed by 8 sign bits; the
    probe only scans its own bucket (~1/256 of the corpus) before exact
    cosine re-ranking.  Approximate by construction → no SQL oracle; recall
    is validated against ``similarity_topk_cosine`` in tests.

    Scale: bucketing is a narrow map; candidate scan is a pruned filter.
    With a partition-by-bucket layout (``repartition(bucket)`` + sorted
    write) the candidate read becomes partition-pruned I/O at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "embedding", lsh_bucket_expr("embedding").alias("bucket")
    )
    probe = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qlit = F.array([F.lit(float(v)) for v in probe["embedding"]])
    return (
        bucketed.filter(
            (F.col("bucket") == probe["bucket"])
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", cosine_similarity(F.col("embedding"), qlit).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
