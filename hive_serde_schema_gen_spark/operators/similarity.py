"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidates from random-hyperplane buckets only).

Cross-engine exactness trick: float sums reassociate differently per engine,
so oracle-compared scores quantize each component to an integer
(``round(x * 10000)``) and compute integer dot products — order-independent
and bit-identical everywhere.  The quantization itself is deterministic:
``x * 10000`` of a float32 is an exact double (24-bit × 14-bit mantissas fit
in 53), and exact ``.5`` ties CAN occur (e.g. ``x = 1/32`` gives exactly
``312.5`` — the 5^4 in 10^4 can cancel against the value's denominator), but
both engines round doubles half-AWAY-FROM-ZERO (Spark ``round`` and DuckDB
``round`` alike; verified ``round(312.5) = 313`` in both), so ties resolve
identically.  That shared-rounding-mode invariant is what the oracle
comparison rests on — not tie impossibility.  Production path without an
oracle would use the plain double ``functions.vector.cosine_similarity``
(same plan shape, no quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine_similarity
from ..registry import query
from ..sources.tables import load_table

QUERY_VEC_ID = 0  # the probe vector for top-k queries
SCALE = 10000


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

    The probe is fetched once (2 KB) and inlined as literals — on a cluster
    it rides the plan to every executor; no join.  The dot product runs as
    posexplode + map-side-combined SUM per vec_id rather than a per-row
    ``aggregate(zip_with(...))`` lambda: higher-order array lambdas drop
    out of whole-stage codegen (measured ~2× slower with multi-second
    compile variance), while the explode pipeline is fully codegen'd and
    its exchange carries only one pre-aggregated row per vector.  Scales
    linearly in corpus size; this is the baseline the ANN implementations
    are verified against (``similarity_lsh_bucketed``)."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    qvec = [
        int(v)
        for v in e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(quantized("embedding").alias("q"))
        .collect()[0]["q"]
    ]
    # exact: integer sum of squares, then one correctly-rounded sqrt —
    # identical to the in-engine sqrt of the same integer
    qnorm = math.sqrt(sum(v * v for v in qvec))
    ex = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
    )
    qlit = F.element_at(
        F.array(*[F.lit(v).cast("long") for v in qvec]), F.col("pos") + 1
    )
    agg = ex.groupBy("vec_id").agg(
        F.sum(F.col("v") * qlit).alias("dot"),
        F.sum(F.col("v") * F.col("v")).alias("nv"),
    )
    return (
        agg.select(
            "vec_id",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nv").cast("double")) * F.lit(qnorm))
            ).alias("cos_sim"),
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
    WITH norms AS (
      SELECT vec_id, label,
             sqrt(CAST(SUM(v * v) AS DOUBLE)) / 10000 AS l2_norm
      FROM (SELECT vec_id, label, {_SQL_QUANT} AS v FROM embeddings)
      GROUP BY vec_id, label)
    SELECT n.vec_id, n.label, n.l2_norm,
           CAST(len(e.embedding) AS INTEGER)                   AS dim,
           CAST(round(CAST(e.embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS q_first,
           CAST(len(list_filter(e.embedding, x -> x > 0)) AS INTEGER)    AS n_positive,
           CAST(round(CAST(list_max(e.embedding) AS DOUBLE) * 10000) AS BIGINT) AS q_max
    FROM norms n JOIN embeddings e USING (vec_id) ORDER BY n.vec_id
    """,
)
def embedding_norms(spark, sf_dir):
    """Per-vector L2 norms (quantized-exact) plus the array-function surface
    (size / element access / filter / max — JVM-side higher-order functions,
    floats quantized at the boundary per the cross-engine exactness rule).
    Norm precompute is the standard trick that turns cosine top-k into a
    single dot product per candidate at query time."""
    e = load_table(spark, sf_dir, "embeddings")
    q = quantized("embedding")
    ql = lambda c: F.round(c.cast("double") * SCALE).cast("long")  # noqa: E731
    return e.select(
        "vec_id",
        "label",
        (F.sqrt(qdot(q, q).cast("double")) / SCALE).alias("l2_norm"),
        F.size("embedding").alias("dim"),
        ql(F.col("embedding")[0]).alias("q_first"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        ql(F.array_max("embedding")).alias("q_max"),
    ).orderBy("vec_id")


N_TABLES = 8  # independent LSH tables (OR-amplification for recall)
PLANES_PER_TABLE = 8  # sign bits per table → 256 buckets each
MULTIPROBE_FLIPS = 1  # also probe buckets within Hamming distance 1


def _planes(table: int, dim: int = 64):
    """Deterministic pseudo-random hyperplanes from md5(table,plane,dim) —
    no RNG state, reproducible across runs and engines."""
    import hashlib

    planes = []
    for p in range(PLANES_PER_TABLE):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{table}:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_buckets(e: DataFrame) -> DataFrame:
    """(vec_id, b0..bN): every table's random-hyperplane bucket id in ONE
    explode + broadcast-join pass (N_TABLES × PLANES_PER_TABLE = 64 planes).

    Formulation matters at this plane count — the weights must be DATA, not
    expression nodes.  64 per-plane ``aggregate(zip_with(...))`` lambdas
    drop out of whole-stage codegen; 64 agg columns over per-plane
    ``F.array`` literals put 4096 expression nodes in the plan and cost
    seconds of driver-side Catalyst analysis per build; one giant flat
    array literal blows up codegen compile instead.  So the 4096 weights
    ride a broadcast-joined DataFrame: explode the embedding once, join
    each component to its 64 plane weights (broadcast hash join — the
    weights table is KBs), sum ``v·w`` per (vec, table, plane), and pack
    sign bits per table.  Every stage is a codegen'd join/aggregate with a
    small fixed expression count.  At 100 TB the bucket columns are
    computed once at ingest and stored, making probe-time candidate reads
    partition-prunable."""
    spark = e.sparkSession
    weights = spark.createDataFrame(
        [
            (t, p, pos, w)
            for t in range(N_TABLES)
            for p, plane in enumerate(_planes(t))
            for pos, w in enumerate(plane)
        ],
        "t int, p int, pos int, w double",
    )
    ex = e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    dots = (
        ex.join(F.broadcast(weights), "pos")
        .groupBy("vec_id", "t", "p")
        .agg(F.sum(F.col("v").cast("double") * F.col("w")).alias("d"))
    )
    # bucket_t = Σ_p (d_{t,p} >= 0) << p, pivoted wide in one aggregate
    per_table = dots.groupBy("vec_id", "t").agg(
        F.sum(
            F.when(F.col("d") >= 0, F.expr("shiftleft(1, p)")).otherwise(0)
        ).alias("bucket")
    )
    return per_table.groupBy("vec_id").agg(
        *[
            F.sum(F.when(F.col("t") == t, F.col("bucket")).otherwise(0))
            .cast("int")
            .alias(f"b{t}")
            for t in range(N_TABLES)
        ]
    )


N_CENTROIDS = 16
N_PROBE = 4
KMEANS_ITERS = 2


def _with_recall_at_10(ann, e, qlit):
    """Attach the accuracy evidence to an ANN top-k result: compute the
    exact brute-force top-10 (same double-cosine metric) over the full
    corpus in-query, and emit the overlap fraction as a ``recall_at_10``
    column.  Costs one extra linear scan — the evidence harness for the
    rows-only driver check, not the production path (the whole point of ANN
    is to avoid this scan; the recall column proves what the avoidance
    gives up)."""
    exact = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id", cosine_similarity(F.col("embedding"), qlit).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    ann_ids = [r["vec_id"] for r in ann.select("vec_id").collect()]
    recall = sum(i in exact_ids for i in ann_ids) / 10.0
    return ann.withColumn("recall_at_10", F.lit(float(recall)))


def _cell_assignments(e: DataFrame, cents: dict) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment via a broadcast-joined
    NORMALIZED-centroid table — centroids are data, not expression nodes.

    The literal formulation (16 ``cosine_similarity(vec, F.array(lit...))``
    lambdas = 1024 literal nodes) costs seconds of driver-side Catalyst
    analysis on every plan build and falls out of whole-stage codegen (same
    lesson as ``lsh_buckets``).  Here the embedding is exploded once,
    joined to the (cell, pos, component/|c|) table (KBs — broadcast), and
    summed per (vec, cell); since |v| is constant across cells, argmax of
    ``dot(v, c/|c|)`` equals argmax of cosine.  Ties break to the LOWEST
    cell index (max over (dot, -cell) structs), matching the previous
    array_position-of-first-max semantics."""
    import math

    spark = e.sparkSession
    rows = []
    for idx, cid in enumerate(sorted(cents)):  # cell idx = rank of its id
        vec = cents[cid]
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        rows += [(idx, pos, float(x) / norm) for pos, x in enumerate(vec)]
    ct = spark.createDataFrame(rows, "cell int, pos int, c double")
    ex = e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    dots = (
        ex.join(F.broadcast(ct), "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("v").cast("double") * F.col("c")).alias("dot"))
    )
    best = dots.groupBy("vec_id").agg(
        F.max(F.struct(F.col("dot"), (-F.col("cell")).alias("nc"))).alias("m")
    )
    return best.select("vec_id", (-F.col("m.nc")).cast("int").alias("cell"))


def _kmeans_refine(e, cents: dict, iters: int = KMEANS_ITERS) -> dict:
    """Lloyd iterations over the corpus: assign → per-cell per-dimension
    mean → new centroids (empty cells keep their old centroid).

    Each iteration is one assignment pass (broadcast-joined centroid table,
    see ``_cell_assignments``) + one (cell, dim) aggregate — at scale that
    is a single shuffle of (16 cells × 64 dims) partial sums, nothing
    proportional to the corpus.  Deterministic given the deterministic seed
    sample; only candidate *selection* depends on it (re-ranking is exact),
    so k-means quality moves recall, not precision."""
    for _ in range(iters):
        assigned = e.join(_cell_assignments(e, cents), "vec_id")
        means = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        new_cents = {}
        for idx, cid in enumerate(sorted(cents)):  # cell idx = rank of its id
            old = cents[cid]
            mean = by_cell.get(idx)
            new_cents[cid] = (
                [mean[p] for p in range(len(old))]
                if mean and len(mean) == len(old)
                else old
            )
        cents = new_cents
    return cents


@query("similarity_ivf_topk", oracle=None)
def similarity_ivf_topk(spark, sf_dir):
    """ANN via IVF (inverted-file index): k-means centroids (deterministic
    seed sample + {it} Lloyd refinement iterations), assign every vector to
    its nearest centroid; a probe scans only the ``N_PROBE`` closest cells
    before exact re-ranking.  Approximate ⇒ rows-only check, so the result
    carries its own accuracy evidence: a ``recall_at_10`` column vs the
    in-query brute-force top-10 (floor also asserted in
    tests/test_advanced.py).

    Scale: assignment is an explode + broadcast-joined centroid-table pass
    (``_cell_assignments`` — centroids as data keep the plan small and
    codegen'd); with a cell-partitioned layout the probe becomes
    partition-pruned I/O, the same trajectory as the LSH
    variant.""".format(it=KMEANS_ITERS)
    import math

    e = load_table(spark, sf_dir, "embeddings")
    cents = {
        c["vec_id"]: list(c["embedding"])
        for c in e.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    }
    cents = _kmeans_refine(e, cents)
    cent_ids = sorted(cents)

    assigned = e.join(_cell_assignments(e, cents), "vec_id").cache()
    probe = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qlit = F.array([F.lit(float(v)) for v in probe["embedding"]])

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    rank = {cid: i for i, cid in enumerate(cent_ids)}  # cell idx = id rank
    cell_ids = [
        rank[cid]
        for cid in sorted(
            cent_ids, key=lambda cid: -cos_py(cents[cid], probe["embedding"])
        )[:N_PROBE]
    ]
    ann = (
        assigned.filter(
            F.col("cell").isin(cell_ids) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", cosine_similarity(F.col("embedding"), qlit).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    return _with_recall_at_10(ann, e, qlit)


@query("similarity_lsh_bucketed", oracle=None)
def similarity_lsh_bucketed(spark, sf_dir):
    """ANN via multi-table, multi-probe random-hyperplane LSH: {t}
    independent tables of {p} sign bits each; a candidate is any vector
    whose bucket in ANY table is within Hamming distance {f} of the probe's
    bucket (OR-amplification across tables + multi-probe within a table —
    the two standard recall levers for sign-LSH, cf. Lv et al., "Multi-probe
    LSH"); exact cosine then re-ranks candidates.  Approximate ⇒ no SQL
    oracle, so the result carries its own accuracy evidence: a
    ``recall_at_10`` column vs the in-query brute-force top-10 (floor also
    asserted in tests/test_advanced.py; this config measures ~2× the recall
    of single-probe 4×4-bit tables at a comparable candidate fraction).

    Scale: bucket columns are computed once at ingest (``lsh_buckets`` —
    one explode+aggregate pass, fully codegen'd); probing stays a handful of
    bucket-id lookups per table, so with a bucket-partitioned layout the
    candidate read is partition-pruned I/O at 100 TB.""".format(
        t=N_TABLES, p=PLANES_PER_TABLE, f=MULTIPROBE_FLIPS
    )
    e = load_table(spark, sf_dir, "embeddings")
    # cached: the probe lookup, the candidate scan, and the recall baseline
    # all consume it within this query (at ingest-scale the bucket columns
    # are persisted storage, not a cache)
    bucketed = e.join(lsh_buckets(e), "vec_id").cache()
    probe = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qlit = F.array([F.lit(float(v)) for v in probe["embedding"]])
    any_shared = None
    for t in range(N_TABLES):
        targets = [probe[f"b{t}"]]
        if MULTIPROBE_FLIPS >= 1:
            targets += [probe[f"b{t}"] ^ (1 << i) for i in range(PLANES_PER_TABLE)]
        cond = F.col(f"b{t}").isin(targets)
        any_shared = cond if any_shared is None else (any_shared | cond)
    ann = (
        bucketed.filter(any_shared & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", cosine_similarity(F.col("embedding"), qlit).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    return _with_recall_at_10(ann, e, qlit)
