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

from ..functions.localdf import local_rows_df
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


_TOPK_SQL = f"""
    WITH e AS (
      SELECT vec_id, {_SQL_QUANT} AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings),
    q AS MATERIALIZED (SELECT v AS qv, i FROM e WHERE vec_id = {QUERY_VEC_ID}),
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
    """


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
    are verified against (``similarity_lsh_bucketed``); the scoring itself
    is the shared ``_quantized_scored`` (one formulation, so the baseline
    and the ANN re-rank cannot drift apart)."""
    from ..sources.tables import fanout_for_compute

    e = load_table(spark, sf_dir, "embeddings")
    # fan the SCORED side only (single-row-group inputs otherwise explode
    # + dot-product on one core; no-op at scale — see fanout_for_compute).
    # The probe fetch stays on the raw scan: a 1-row lookup must not pay
    # an exchange.
    scored_src = fanout_for_compute(e, "vec_id")
    return (
        _quantized_scored(scored_src, _probe_qvec(e))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


_PAIRS_SQL = f"""
    WITH e AS (
      SELECT vec_id, label, {_SQL_QUANT} AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id < 500),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(SUM(a.v * b.v) AS DOUBLE) AS dot,
             CAST(SUM(a.v * a.v) AS DOUBLE) AS na,
             CAST(SUM(b.v * b.v) AS DOUBLE) AS nb
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id)
    SELECT vec_a, vec_b, dot / (sqrt(na) * sqrt(nb)) AS cos_sim
    FROM pairs WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.40
    ORDER BY vec_a, vec_b
    """


def similarity_pairs_threshold(spark, sf_dir):
    """Embedding-cosine near-dup pairs (≥0.40) over a bounded id range — the
    exact quadratic baseline.  The range bound keeps the demo pairwise join
    honest; the unbounded-scale version is the LSH-bucketed query.

    Threshold calibration: the synthetic embeddings are near-orthogonal
    (max pairwise cosine over the whole sf0.01 corpus is ~0.51), so the
    original 0.9 threshold returned ZERO rows every round — a green hash
    that only proved both engines found nothing (round-8 verdict).  0.40
    over vec_id < 500 yields a stable non-empty set (59 pairs at sf0.01),
    making the slot real evidence of the pairwise arithmetic."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
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
        .filter(F.col("cos_sim") >= 0.40)
        .orderBy("vec_a", "vec_b")
    )


_NORMS_SQL = f"""
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
    """


def embedding_norms(spark, sf_dir):
    """Per-vector L2 norms (quantized-exact) plus the array-function surface
    (size / element access / filter / max — JVM-side higher-order functions,
    floats quantized at the boundary per the cross-engine exactness rule).
    Norm precompute is the standard trick that turns cosine top-k into a
    single dot product per candidate at query time."""
    from ..sources.tables import fanout_for_compute

    # the interpreted higher-order lambdas below (filter/array_max) drop
    # out of codegen — on a single-row-group scan they all ran on one
    # core (no-op at scale — see fanout_for_compute)
    e = fanout_for_compute(load_table(spark, sf_dir, "embeddings"), "vec_id")
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


# op='rp' configuration: random_projection(exact=True) over the
# vec_id % RP_MOD == RP_REM slice — ±1 md5 weights re-derived in SQL, the
# 9-dp decimal component sums re-reduced exactly, and the 1/√16 = ÷4
# scale an exact IEEE exponent shift, so the projected doubles are
# bit-identical cross-engine (see projection.random_projection).
RP_MOD, RP_REM = 7, 1
RP_OUT_DIM, RP_IN_DIM, RP_SEED = 16, 64, "rp-v1"

_RP_SQL = f"""
    WITH rpw AS (
      SELECT i.i AS pos, j.j AS j,
             CASE WHEN CAST(concat('0x', substr(md5('{RP_SEED}:' || i.i ||
                    ':' || j.j), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS w
      FROM range({RP_IN_DIM}) i(i), range({RP_OUT_DIM}) j(j)),
    rpx AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) - 1 AS pos
      FROM embeddings WHERE vec_id % {RP_MOD} = {RP_REM}),
    rpy AS (
      SELECT x.vec_id, w.j,
             CAST(SUM(CAST(round(x.x, 9) AS DECIMAL(20,9)) * w.w) AS DOUBLE)
               / 4 AS y
      FROM rpx x JOIN rpw w ON w.pos = x.pos
      GROUP BY x.vec_id, w.j)
    SELECT vec_id, j, y FROM rpy
"""


@query(
    "similarity_brute",
    oracle=f"""
    SELECT 'topk' AS op, vec_id, CAST(NULL AS BIGINT) AS vec_b,
           CAST(NULL AS VARCHAR) AS label, cos_sim,
           CAST(NULL AS DOUBLE) AS l2_norm, CAST(NULL AS INTEGER) AS dim,
           CAST(NULL AS BIGINT) AS q_first,
           CAST(NULL AS INTEGER) AS n_positive, CAST(NULL AS BIGINT) AS q_max
    FROM ({_TOPK_SQL}) tk_
    UNION ALL
    SELECT 'pairs' AS op, vec_a AS vec_id, vec_b,
           CAST(NULL AS VARCHAR) AS label, cos_sim,
           CAST(NULL AS DOUBLE) AS l2_norm, CAST(NULL AS INTEGER) AS dim,
           CAST(NULL AS BIGINT) AS q_first,
           CAST(NULL AS INTEGER) AS n_positive, CAST(NULL AS BIGINT) AS q_max
    FROM ({_PAIRS_SQL}) pr_
    UNION ALL
    SELECT 'norms' AS op, vec_id, CAST(NULL AS BIGINT) AS vec_b, label,
           CAST(NULL AS DOUBLE) AS cos_sim, l2_norm, dim, q_first,
           n_positive, q_max
    FROM ({_NORMS_SQL}) nm_
    UNION ALL
    SELECT 'rp' AS op, vec_id, CAST(j AS BIGINT) AS vec_b,
           CAST(NULL AS VARCHAR) AS label, y AS cos_sim,
           CAST(NULL AS DOUBLE) AS l2_norm, CAST(NULL AS INTEGER) AS dim,
           CAST(NULL AS BIGINT) AS q_first,
           CAST(NULL AS INTEGER) AS n_positive, CAST(NULL AS BIGINT) AS q_max
    FROM ({_RP_SQL}) rp_
    ORDER BY op, vec_id, vec_b NULLS FIRST
    """,
)
def similarity_brute(spark, sf_dir):
    """The brute-force similarity family in ONE driver slot (round-10
    tagged-union merge of ``similarity_topk_cosine``,
    ``similarity_pairs_threshold`` and ``embedding_norms`` — component
    docstrings above carry the algorithms, determinism tricks and scale
    notes; slots freed for ``hybrid_topk`` / ``web_corpus_from_crawl``).
    ``topk`` rows: the exact cosine top-10 recall baseline every ANN
    variant is verified against; ``pairs`` rows: the quadratic near-dup
    pair baseline (>= 0.40 over vec_id < 500); ``norms`` rows: per-vector
    L2 norms + the array-function surface.

    Round-11 continuation: ``rp`` rows pin the Johnson–Lindenstrauss
    random projection (`projection.random_projection`, exact mode) for
    the vec_id % {RP_MOD} == {RP_REM} slice — every projected component
    bit-identical cross-engine (±1 md5 weights, exact decimal sums, ÷4
    exponent-shift scale; see `RP_MOD`)."""
    from ..functions.union import pad_union
    from .projection import random_projection

    schema = [
        ("op", "string"), ("vec_id", "bigint"), ("vec_b", "bigint"),
        ("label", "string"), ("cos_sim", "double"), ("l2_norm", "double"),
        ("dim", "int"), ("q_first", "bigint"), ("n_positive", "int"),
        ("q_max", "bigint"),
    ]
    return pad_union(
        schema,
        (
            similarity_topk_cosine(spark, sf_dir),
            {"op": F.lit("topk"), "vec_id": "vec_id", "cos_sim": "cos_sim"},
        ),
        (
            similarity_pairs_threshold(spark, sf_dir),
            {
                "op": F.lit("pairs"), "vec_id": "vec_a", "vec_b": "vec_b",
                "cos_sim": "cos_sim",
            },
        ),
        (
            embedding_norms(spark, sf_dir),
            {
                "op": F.lit("norms"), "vec_id": "vec_id", "label": "label",
                "l2_norm": "l2_norm", "dim": "dim", "q_first": "q_first",
                "n_positive": "n_positive", "q_max": "q_max",
            },
        ),
        (
            random_projection(
                load_table(spark, sf_dir, "embeddings").filter(
                    F.col("vec_id") % RP_MOD == RP_REM
                ),
                out_dim=RP_OUT_DIM,
                in_dim=RP_IN_DIM,
                seed=RP_SEED,
                exact=True,
            ).select(
                "vec_id",
                F.posexplode("embedding_rp").alias("j", "y"),
            ),
            {
                "op": F.lit("rp"), "vec_id": "vec_id", "vec_b": "j",
                "cos_sim": "y",
            },
        ),
    ).orderBy("op", "vec_id", F.col("vec_b").asc_nulls_first())




# ---------------------------------------------------------------------------
# ANN — both variants run on QUANTIZED integer arithmetic end-to-end, which
# makes every intermediate (hyperplane signs, k-means centroids, candidate
# sets, re-rank scores) order-independent and bit-identical across engines:
# the full ANN pipeline is re-derivable in DuckDB SQL, so these queries are
# driver-green on rows+schema+hash, not rows-only.  Quantizing at 1e-4 does
# not change ANN semantics (the planes/centroids are random directions);
# what it buys is that a distributed SUM over exploded components can never
# flip a near-zero sign bit — integer addition commutes exactly, closing the
# reproducibility caveat float dot products would carry.
# ---------------------------------------------------------------------------

# Chosen by a DuckDB-side sweep over (tables, planes, flips) × sf0.001/0.01/
# 0.1 — possible BECAUSE the pipeline is SQL-reproducible.  12×14-bit tables
# probed at Hamming ≤3 measured recall@10 = 0.9 at candidate fraction ~0.33
# at sf0.01 AND sf0.1 (0.7 on the 50-vector sf0.001 corpus, where brute
# force is the right tool anyway); the r3 config (8×8-bit, flips=1) sat at
# 0.6 recall.  More tables/fewer flips trades driver-side probe count
# against candidate volume — flips win here because the corpus is clustered.
N_TABLES = 12  # independent LSH tables (OR-amplification for recall)
PLANES_PER_TABLE = 14  # sign bits per table → 16384 buckets each
MULTIPROBE_FLIPS = 3  # probe buckets within Hamming distance ≤3 per table

N_CENTROIDS = 16
N_PROBE = 4
KMEANS_ITERS = 2


def _planes(table: int, dim: int = 64):
    """Deterministic pseudo-random INTEGER hyperplane weights from
    md5(table:plane:dim) — ``h % 2001 - 1000`` ∈ [-1000, 1000].  No RNG
    state; reproducible across runs AND engines (DuckDB parses the same md5
    prefix via ``CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT)``)."""
    import hashlib

    planes = []
    for p in range(PLANES_PER_TABLE):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{table}:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h % 2001 - 1000)
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
    ride a broadcast-joined DataFrame: explode the QUANTIZED embedding
    once, join each component to its 64 integer plane weights (broadcast
    hash join — the weights table is KBs), sum ``q_v·w`` per (vec, table,
    plane) — a LONG sum, order-independent — and pack sign bits per table.
    Every stage is a codegen'd join/aggregate with a small fixed expression
    count.  At 100 TB the bucket columns are computed once at ingest and
    stored, making probe-time candidate reads partition-prunable."""
    spark = e.sparkSession
    weights = local_rows_df(
        spark,
        [
            (t, p, pos, w)
            for t in range(N_TABLES)
            for p, plane in enumerate(_planes(t))
            for pos, w in enumerate(plane)
        ],
        "t int, p int, pos int, w long",
    )
    ex = e.select("vec_id", F.posexplode(quantized("embedding")).alias("pos", "v"))
    dots = (
        ex.join(F.broadcast(weights), "pos")
        .groupBy("vec_id", "t", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("d"))
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
            .cast("long")
            .alias(f"b{t}")
            for t in range(N_TABLES)
        ]
    )


def _quantized_scored(e: DataFrame, qvec) -> DataFrame:
    """(vec_id, cos_sim) for every vector except the probe — the exact
    integer-dot cosine used by both the re-rank and the recall baseline
    (same formulation as ``similarity_topk_cosine``: posexplode +
    map-side-combined SUM, fully codegen'd; the probe rides the plan as a
    64-literal array, no join)."""
    import math

    qnorm = math.sqrt(sum(v * v for v in qvec))
    ex = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
    )
    qlit = F.element_at(
        F.array(*[F.lit(int(v)).cast("long") for v in qvec]), F.col("pos") + 1
    )
    agg = ex.groupBy("vec_id").agg(
        F.sum(F.col("v") * qlit).alias("dot"),
        F.sum(F.col("v") * F.col("v")).alias("nv"),
    )
    return agg.select(
        "vec_id",
        (
            F.col("dot").cast("double")
            / (F.sqrt(F.col("nv").cast("double")) * F.lit(qnorm))
        ).alias("cos_sim"),
    )


def _probe_qvec(e: DataFrame):
    """The probe's quantized embedding, rounded ENGINE-side (Python round()
    is banker's rounding — never quantize driver-side)."""
    return [
        int(v)
        for v in e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(quantized("embedding").alias("q"))
        .collect()[0]["q"]
    ]


def _rerank_candidates(cand_q: DataFrame, qvec, k: int = 10) -> DataFrame:
    """Exact cosine re-rank of the CANDIDATE SET ONLY — (vec_id, q) rows in,
    top-k (vec_id, cos_sim) out.  Same integer-dot formulation as
    ``_quantized_scored`` (posexplode + map-side-combined SUM, probe inlined
    as literals), but the explode/aggregate runs over candidate rows, never
    the corpus: this is the production scoring path, where candidate count —
    not corpus size — bounds the re-rank cost."""
    import math

    qnorm = math.sqrt(sum(v * v for v in qvec))
    ex = cand_q.select("vec_id", F.posexplode("q").alias("pos", "v"))
    qlit = F.element_at(
        F.array(*[F.lit(int(v)).cast("long") for v in qvec]), F.col("pos") + 1
    )
    agg = ex.groupBy("vec_id").agg(
        F.sum(F.col("v") * qlit).alias("dot"),
        F.sum(F.col("v") * F.col("v")).alias("nv"),
    )
    # Zero-norm guard (same sentinel as pq_approx_scores): a zero-vector
    # candidate (empty-text doc) or query gives 0/0 = NaN, and Spark
    # sorts NaN ABOVE every double — the junk row would take rank 1.
    cos = F.when(
        (F.col("nv") > 0) & (F.lit(qnorm) > 0),
        F.col("dot").cast("double")
        / (F.sqrt(F.col("nv").cast("double")) * F.lit(qnorm)),
    ).otherwise(F.lit(-1.0))
    return (
        agg.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def hamming_ball(bucket: int, n_bits: int = PLANES_PER_TABLE,
                 radius: int = MULTIPROBE_FLIPS) -> list:
    """All bucket ids within Hamming distance ``radius`` of ``bucket`` —
    the multi-probe set enumerated EXPLICITLY (Σ C(n_bits, 0..radius) ids;
    470 for 14 bits / radius 3).  Against a bucket-partitioned layout this
    turns the probe from a full bucket-table scan (``bit_count(xor) <= r``
    must look at every row) into a partition-prunable IN-list / broadcast
    semi-join on bucket id."""
    from itertools import combinations

    out = [bucket]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_bits), r):
            m = 0
            for b in bits:
                m |= 1 << b
            out.append(bucket ^ m)
    return out


def build_lsh_index(e: DataFrame) -> DataFrame:
    """The ingest-time artifact: (vec_id, q, b0..bN) — quantized vectors
    plus every table's bucket id, materialized once (localCheckpoint here;
    partitioned parquet via ``sources.sinks.write_curated`` in a real
    deployment, which is what makes the probe partition-prunable).  Build
    cost is one corpus pass; every subsequent ``ann_topk_lsh(..., index=)``
    query pays only probe + candidates + re-rank."""
    return (
        e.select("vec_id", quantized("embedding").alias("q"))
        .join(lsh_buckets(e), "vec_id")
        .localCheckpoint()
    )


def ann_topk_lsh(e: DataFrame, k: int = 10,
                 query_vec_id: int = QUERY_VEC_ID,
                 index: DataFrame | None = None) -> DataFrame:
    """PRODUCTION LSH ANN top-k — no evidence columns, no full-corpus scan.

    The driver-green ``similarity_lsh_bucketed`` deliberately embeds a
    full-corpus brute-force audit (``recall_at_10`` / ``cand_frac``) so the
    oracle can certify recall; that audit must never be the only mode.  This
    entry point does only the production work:

    1. bucket index (at 100 TB: precomputed at ingest, stored, partitioned
       by bucket — here built inline for self-containment),
    2. probe lookup (one-row collect),
    3. candidate selection via the ENUMERATED Hamming ball per table
       (``hamming_ball``), joined as a broadcast (table, bucket) DataFrame
       of N_TABLES×~470 rows against the unpivoted index — NOT as
       literal IN-lists (measured: 12 × 470-literal ``isin`` costs 3-5 s
       of driver-side analysis/codegen per query vs ~0.03 s for the tiny
       broadcast; and against a bucket-partitioned layout the broadcast
       join drives dynamic partition pruning, same pruning as a static
       IN — demonstrated in tests/test_ann_production.py), and NOT as a
       ``bit_count(xor)`` predicate (which must scan every index row),
    4. exact re-rank of candidates only (``_rerank_candidates``).

    The returned plan contains no aggregate over non-candidate rows —
    asserted by ``tests/test_ann_production.py``.  Pass a prebuilt
    ``index`` (``build_lsh_index``) to amortize the corpus pass across
    queries — the deployment shape; measured at sf0.1 the per-query work
    drops from ~3.7 s (inline rebuild) to ~0.85 s (probe + candidates +
    re-rank only)."""
    bucketed = index if index is not None else build_lsh_index(e)
    probe = bucketed.filter(F.col("vec_id") == query_vec_id).collect()[0]
    qvec = [int(x) for x in probe["q"]]
    cand_ids = _lsh_candidate_ids(bucketed, probe, query_vec_id)
    cand_q = bucketed.select("vec_id", "q").join(cand_ids, "vec_id")
    return _rerank_candidates(cand_q, qvec, k)


def _lsh_candidate_ids(
    bucketed: DataFrame, probe, query_vec_id: int
) -> DataFrame:
    """Candidate vec_ids for one probe: the enumerated Hamming ball per
    table, broadcast-joined against the unpivoted bucket index (the
    partition-prunable read pattern — see ``ann_topk_lsh`` step 3)."""
    spark = bucketed.sparkSession
    ball = local_rows_df(
        spark,
        [
            (t, b)
            for t in range(N_TABLES)
            for b in hamming_ball(int(probe[f"b{t}"]))
        ],
        "t int, b long",
    )
    long = bucketed.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"b{t}") for t in range(N_TABLES)])
        ).alias("t", "b"),
    )
    return (
        long.join(F.broadcast(ball), ["t", "b"])
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )


def build_ivf_index(e: DataFrame):
    """The IVF ingest-time artifact: ``(centroids, assigned)`` where
    ``centroids`` is the refined integer centroid dict (driver-side, 16×64
    longs) and ``assigned`` is the checkpointed (vec_id, q, cell) table —
    in a real deployment written cell-partitioned
    (``sources.sinks.write_curated(partition_by=("cell",))``) so a probe
    reads only its ``N_PROBE`` cells' partitions."""
    eq = e.select(
        "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
    ).localCheckpoint()
    seeds = sorted(
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", quantized("embedding").alias("q"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = {i: [int(x) for x in r["q"]] for i, r in enumerate(seeds)}
    cents = _kmeans_refine(eq, cents)
    assigned = (
        e.select("vec_id", quantized("embedding").alias("q"))
        .join(_cell_assignments(eq, cents), "vec_id")
        .localCheckpoint()
    )
    return cents, assigned


def _probe_cells(cents: dict, qvec) -> list:
    """The ``N_PROBE`` centroid cells nearest the query by integer-dot
    cosine (driver-side over 16 centroids; deterministic cell-id
    tie-break) — shared by the plain-IVF and IVF-PQ probes."""
    import math

    def metric(vec):
        d = sum(q * c for q, c in zip(qvec, vec))
        return d / math.sqrt(sum(c * c for c in vec))

    return sorted(cents, key=lambda cell: (-metric(cents[cell]), cell))[:N_PROBE]


def ann_topk_ivf(e: DataFrame, k: int = 10,
                 query_vec_id: int = QUERY_VEC_ID,
                 index=None) -> DataFrame:
    """PRODUCTION IVF ANN top-k — no evidence columns, no full-corpus
    brute-force audit.  Index build (k-means + assignment,
    ``build_ivf_index``) is the ingest-time cost — pass it via ``index``
    to amortize across queries; query-time work is probe-cell ranking
    (driver-side over 16 centroids) + exact re-rank of the vectors in the
    ``N_PROBE`` probed cells only."""
    cents, assigned = index if index is not None else build_ivf_index(e)
    qvec = [
        int(x)
        for x in assigned.filter(F.col("vec_id") == query_vec_id)
        .collect()[0]["q"]
    ]
    pcells = _probe_cells(cents, qvec)
    cand_q = assigned.filter(
        F.col("cell").isin(pcells) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id", "q")
    return _rerank_candidates(cand_q, qvec, k)


def ann_topk_ivf_pq(
    e: DataFrame,
    k: int = 10,
    query_vec_id: int = QUERY_VEC_ID,
    index=None,
    pq=None,
    rerank_mult: int = 4,
) -> DataFrame:
    """PRODUCTION IVF ANN with a PQ-compressed first pass — the IVF-PQ
    composition of Jégou et al. (the configuration FAISS ships as
    ``IVFx,PQy``), closing the round-7 gap where PQ re-rank existed on
    the LSH path only: candidates come from the ``N_PROBE`` probed cells
    exactly as in :func:`ann_topk_ivf`, but first-pass scoring reads only
    PQ codes against the broadcast per-query ADC lookup table; full
    vectors are touched for just the top ``k × rerank_mult`` approximate
    hits (exact integer-cosine re-rank, same ``_rerank_candidates`` tail
    as every ANN path).

    At 100 TB this pairs IVF's partition pruning (probe reads N_PROBE/16
    of the cell-partitioned store) with PQ's byte shrink (~16× fewer
    bytes per scanned candidate) — the probe cost drops multiplicatively.
    Pass ``index=build_ivf_index(e)`` and ``pq=build_pq_index(e)`` to
    amortize both ingest passes."""
    cents, assigned = index if index is not None else build_ivf_index(e)
    codebook, codes = pq if pq is not None else build_pq_index(e)
    qvec = [
        int(x)
        for x in assigned.filter(F.col("vec_id") == query_vec_id)
        .collect()[0]["q"]
    ]
    pcells = _probe_cells(cents, qvec)
    cand_ids = assigned.filter(
        F.col("cell").isin(pcells) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id")
    approx = pq_approx_scores(codes.join(cand_ids, "vec_id"), codebook, qvec)
    short = (
        approx.orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(k * rerank_mult)
        .select("vec_id")
    )
    cand_q = assigned.select("vec_id", "q").join(short, "vec_id")
    return _rerank_candidates(cand_q, qvec, k)


# ---------------------------------------------------------------------------
# Product quantization (memory-compressed re-rank)
# ---------------------------------------------------------------------------
#
# Jégou et al. 2011 ("Product Quantization for Nearest Neighbor Search"):
# split each vector into PQ_SUBSPACES sub-vectors, k-means each subspace to
# PQ_CODES centroids, store one code per subspace.  The stored per-vector
# payload drops from 64 longs (512 B) to PQ_SUBSPACES small ints — the
# artifact a 100-TB deployment actually keeps hot — and candidate scoring
# becomes ADC (asymmetric distance computation): a per-query lookup table
# of sub-dot-products, broadcast-joined against exploded codes.  Exact
# re-rank touches full vectors only for the final k × rerank_mult rows.
# Training reuses the integer-k-means discipline of the IVF path (long
# sums, engine-side round, empty codes keep their centroid) so the whole
# pipeline stays deterministic.

PQ_SUBSPACES = 8
PQ_CODES = 256
PQ_RERANK_MULT = 4


def _pq_exploded(e: DataFrame, n_subspaces: int, subdim: int) -> DataFrame:
    """(vec_id, s, p, v): quantized components tagged with subspace ``s``
    and within-subspace position ``p``."""
    return e.select(
        "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") / subdim).cast("int").alias("s"),
        F.pmod(F.col("pos"), F.lit(subdim)).alias("p"),
        "v",
    )


_PQ_CODE_RADIX = 4096  # > max n_codes; keeps (d2, code) in ONE long


def _pq_assign(ex: DataFrame, codebook: dict) -> DataFrame:
    """(vec_id, s, code): nearest codebook entry per subspace, by exact
    integer L2 (Σ(v-w)² over the subdim components — LONG arithmetic, so
    assignment is partition-order-independent); ties break to the lowest
    code.

    The argmin is a mixed-radix LONG min (``d2 * 4096 + code`` — monotone
    in (d2, code) since code < 4096), NOT ``min(struct(d2, code))``:
    struct aggregation buffers force Spark onto SortAggregate, a
    per-partition sort of the (vec × code) distance relation — the
    ingest-time PQ build's largest intermediate — while a long min stays
    a pure HashAggregate with map-side combine.  Range check: d2 <=
    subdim · (2·max|q|)² ≈ 10⁹ at this corpus's quantization, times 4096
    is far under 2⁶³.

    Round 17 (guide §2.3 — shuffle/aggregate fewer rows): the subspace
    components ride as WIDE COLUMNS, not exploded rows.  The old shape
    joined the (vec, s, p) explosion against the codebook on (s, p) —
    a (vec × code × subdim)-row intermediate aggregated twice; this
    shape pre-pivots to one row per (vec, s) (a subdim-fold smaller
    join input), joins the broadcast codebook on ``s`` alone, computes
    the SAME integer Σ(v−w)² as one codegen expression, and takes the
    mixed-radix min in ONE HashAggregate over (vec × code) rows.
    Measured at slot scale: build_pq_index 8.4 s → see
    OPTIMIZATION_r17.md; assignment values are bit-identical (exact
    LONG arithmetic either way, pinned by the PQ oracles)."""
    spark = ex.sparkSession
    subdim = len(next(iter(codebook.values())))
    wide = ex.groupBy("vec_id", "s").agg(
        *[
            F.sum(F.when(F.col("p") == k, F.col("v"))).alias(f"__v{k}")
            for k in range(subdim)
        ]
    )
    ctw = local_rows_df(
        spark,
        [(s, c, *(int(w) for w in vec)) for (s, c), vec in codebook.items()],
        "s int, code int, "
        + ", ".join(f"__w{k} long" for k in range(subdim)),
    )
    d2 = sum(
        (F.col(f"__v{k}") - F.col(f"__w{k}"))
        * (F.col(f"__v{k}") - F.col(f"__w{k}"))
        for k in range(subdim)
    )
    best = (
        wide.join(F.broadcast(ctw), "s")
        .groupBy("vec_id", "s")
        .agg(F.min(d2 * F.lit(_PQ_CODE_RADIX) + F.col("code")).alias("__best"))
    )
    return best.select(
        "vec_id",
        "s",
        F.pmod(F.col("__best"), F.lit(_PQ_CODE_RADIX)).cast("int").alias("code"),
    )


def build_pq_index(
    e: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    iters: int = KMEANS_ITERS,
):
    """The PQ ingest-time artifact: ``(codebook, codes)`` where ``codebook``
    maps (subspace, code) → subdim integer centroid (driver-side,
    ≤ n_subspaces × n_codes × subdim longs ≈ 128 K values at the defaults)
    and ``codes`` is the checkpointed (vec_id, codes array<int>) table —
    ~16× smaller per vector than the quantized-long artifact
    (``build_lsh_index``'s ``q`` column), measured in
    tests/test_pq_rerank.py.

    Seeding follows the IVF path (first ``n_codes`` vectors by vec_id give
    each subspace its initial centroids — deterministic, no RNG), then
    ``iters`` Lloyd rounds per subspace run as ONE joint
    assign → per-(s, code, p) integer-mean pass over all subspaces (the
    subspace dimension rides the groupBy key; no per-subspace jobs)."""
    dim = len(e.select(quantized("embedding").alias("q")).first()["q"])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    if n_codes > _PQ_CODE_RADIX:
        raise ValueError(
            f"n_codes {n_codes} exceeds the argmin encoding radix "
            f"{_PQ_CODE_RADIX}"
        )
    subdim = dim // n_subspaces
    ex = _pq_exploded(e, n_subspaces, subdim).localCheckpoint()
    seeds = (
        e.select("vec_id", quantized("embedding").alias("q"))
        .orderBy("vec_id")
        .limit(n_codes)
        .collect()
    )
    codebook = {
        (s, c): [int(x) for x in r["q"][s * subdim : (s + 1) * subdim]]
        for c, r in enumerate(seeds)
        for s in range(n_subspaces)
    }
    for _ in range(iters):
        means = (
            ex.join(_pq_assign(ex, codebook), ["vec_id", "s"])
            .groupBy("s", "code", "p")
            .agg(
                F.round(F.sum("v").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        by_key: dict = {}
        for r in means:
            by_key.setdefault((r["s"], r["code"]), {})[r["p"]] = r["c"]
        codebook = {
            key: (
                [by_key[key][p] for p in range(subdim)]
                if key in by_key and len(by_key[key]) == subdim
                else old
            )
            for key, old in codebook.items()
        }
    codes = (
        _pq_assign(ex, codebook)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
        .localCheckpoint()
    )
    return codebook, codes


def pq_approx_scores(codes: DataFrame, codebook: dict, qvec) -> DataFrame:
    """(vec_id, approx_cos): ADC scoring — the query is chopped into the
    same subspaces and a (s, code) → (partial dot, partial ‖c‖²) lookup
    table is computed driver-side and broadcast; each vector's approximate
    cosine is then one join + one map-side-combined SUM over its
    ``n_subspaces`` code rows.  No full vector is read."""
    import math

    spark = codes.sparkSession
    subdim = len(next(iter(codebook.values())))
    qnorm = math.sqrt(sum(v * v for v in qvec))
    lut = local_rows_df(
        spark,
        [
            (
                s,
                c,
                sum(
                    int(qv) * int(w)
                    for qv, w in zip(qvec[s * subdim : (s + 1) * subdim], vec)
                ),
                sum(int(w) * int(w) for w in vec),
            )
            for (s, c), vec in codebook.items()
        ],
        "s int, code int, pdot long, pn2 long",
    )
    ex = codes.select(
        "vec_id", F.posexplode("codes").alias("s", "code")
    )
    agg = (
        ex.join(F.broadcast(lut), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("pdot").alias("adot"), F.sum("pn2").alias("an2"))
    )
    # Zero-norm guard: a candidate assigned all-zero centroids (the
    # near-zero embedding region) gives an2=0 → 0/0 = NaN, and Spark sorts
    # NaN ABOVE every double — junk rows would crowd the descending
    # shortlist.  Score them -1 (below any true cosine) instead; a zero
    # QUERY vector has no meaningful ranking at all, same sentinel.
    cos_expr = (
        F.col("adot").cast("double")
        / (F.sqrt(F.col("an2").cast("double")) * F.lit(qnorm))
    )
    return agg.select(
        "vec_id",
        F.when(
            (F.col("an2") > 0) & F.lit(qnorm > 0), cos_expr
        ).otherwise(F.lit(-1.0)).alias("approx_cos"),
    )


def ann_topk_lsh_pq(
    e: DataFrame,
    k: int = 10,
    query_vec_id: int = QUERY_VEC_ID,
    index: DataFrame | None = None,
    pq=None,
    rerank_mult: int = PQ_RERANK_MULT,
) -> DataFrame:
    """PRODUCTION LSH ANN with a PQ-compressed re-rank: candidates come
    from the enumerated Hamming ball exactly as in ``ann_topk_lsh``, but
    the first-pass scoring reads only PQ codes + the broadcast lookup
    table; full vectors are touched for just the top ``k × rerank_mult``
    approximate hits (exact integer-cosine re-rank, same
    ``_rerank_candidates`` as every other ANN path).

    At 100 TB this is the memory-shape that matters: the hot candidate
    scan reads ~16× fewer bytes per vector, and the exact re-rank is a
    k×mult-row join against the cold full-vector store rather than a
    candidate-set-sized one.  Pass ``index=build_lsh_index(e)`` and
    ``pq=build_pq_index(e)`` to amortize both ingest passes."""
    if index is None and pq is None:
        # both ingest artifacts need building and are independent —
        # overlap them from a driver thread (guide §2.6); the LSH
        # checkpoint build back-fills executors idled by the PQ build's
        # driver-side Lloyd collects.  Deterministic builds: overlap
        # cannot change any result row.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(build_lsh_index, e)
            codebook, codes = build_pq_index(e)
            bucketed = fut.result()
    else:
        bucketed = index if index is not None else build_lsh_index(e)
        codebook, codes = pq if pq is not None else build_pq_index(e)
    probe = bucketed.filter(F.col("vec_id") == query_vec_id).collect()[0]
    qvec = [int(x) for x in probe["q"]]
    cand_ids = _lsh_candidate_ids(bucketed, probe, query_vec_id)
    approx = pq_approx_scores(codes.join(cand_ids, "vec_id"), codebook, qvec)
    short = (
        approx.orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(k * rerank_mult)
        .select("vec_id")
    )
    cand_q = bucketed.select("vec_id", "q").join(short, "vec_id")
    return _rerank_candidates(cand_q, qvec, k)


def _ann_result(e: DataFrame, cand: DataFrame, qvec) -> DataFrame:
    """Shared ANN tail: exact re-rank of the candidate set, top-10, plus
    the two deterministic evidence columns the oracle recomputes —
    ``recall_at_10`` (overlap with the in-query brute-force top-10) and
    ``cand_frac`` (candidate-set fraction, the cost the recall was bought
    at).  Both are exact integer ratios, so they hash-match DuckDB."""
    scored = _quantized_scored(e, qvec).localCheckpoint()
    exact_ids = {
        r["vec_id"]
        for r in scored.orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
        .collect()
    }
    ann = (
        scored.join(cand, "vec_id")
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    ann_ids = [r["vec_id"] for r in ann.select("vec_id").collect()]
    recall = len(exact_ids & set(ann_ids)) / 10.0
    n_cand = cand.count()
    n_tot = e.filter(F.col("vec_id") != QUERY_VEC_ID).count()
    return ann.withColumn("recall_at_10", F.lit(float(recall))).withColumn(
        "cand_frac", F.lit(n_cand / n_tot)
    )


# Shared oracle tail: exact quantized re-rank + the evidence columns.
# Assumes CTEs `e` (quantized exploded embeddings) and `cand` (vec_id set).
_SQL_RERANK = f"""
    q AS MATERIALIZED (SELECT v AS qv, i FROM e WHERE vec_id = {QUERY_VEC_ID}),
    scored AS MATERIALIZED (
      SELECT e.vec_id,
             CAST(SUM(e.v * q.qv) AS DOUBLE) AS dot,
             CAST(SUM(e.v * e.v) AS DOUBLE) AS nv,
             CAST(SUM(q.qv * q.qv) AS DOUBLE) AS nq
      FROM e JOIN q USING (i) WHERE e.vec_id <> {QUERY_VEC_ID}
      GROUP BY e.vec_id),
    exact10 AS MATERIALIZED (
      SELECT vec_id FROM scored
      ORDER BY dot / (sqrt(nv) * sqrt(nq)) DESC, vec_id LIMIT 10),
    ann AS MATERIALIZED (
      SELECT s.vec_id, s.dot / (sqrt(s.nv) * sqrt(s.nq)) AS cos_sim
      FROM scored s JOIN cand USING (vec_id)
      ORDER BY cos_sim DESC, vec_id LIMIT 10),
    ev AS (SELECT
      (SELECT CAST(COUNT(*) AS DOUBLE) FROM ann JOIN exact10 USING (vec_id))
        / 10.0 AS recall_at_10,
      (SELECT CAST(COUNT(*) AS DOUBLE) FROM cand)
        / (SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) FROM e
           WHERE vec_id <> {QUERY_VEC_ID}) AS cand_frac)
    SELECT ann.vec_id, ann.cos_sim, ev.recall_at_10, ev.cand_frac
    FROM ann, ev ORDER BY ann.cos_sim DESC, ann.vec_id
"""

_SQL_E = (
    f"SELECT vec_id, {_SQL_QUANT} AS v, generate_subscripts(embedding, 1) AS i"
    " FROM embeddings"
)

# LSH candidate-set CTEs (assume CTE `src` = quantized exploded embeddings;
# produce CTE `{p}cand` = the multiprobe candidate vec_id set).  Shared
# between the `similarity_lsh_bucketed` oracle and the hybrid-retrieval
# oracle; the free-text hybrid branch instantiates a second copy with a
# prefix, a corpus∪query source, and the reserved probe id.


def _lsh_cand_ctes(src: str = "e", probe: int = QUERY_VEC_ID, p: str = "") -> str:
    # MATERIALIZED: DuckDB inlines CTEs, and these are referenced from
    # multiple downstream branches — without it the hash-plane subtree
    # re-executes per reference (the round-12 EMFILE lesson, logreg.py)
    return f"""{p}w AS MATERIALIZED (
      SELECT t.t AS t, p.p AS p, d.d + 1 AS i,
             CAST(concat('0x', substr(md5(t.t || ':' || p.p || ':' || d.d), 1, 8))
                  AS BIGINT) % 2001 - 1000 AS w
      FROM range({N_TABLES}) t(t), range({PLANES_PER_TABLE}) p(p), range(64) d(d)),
    {p}dots AS MATERIALIZED (
      SELECT e.vec_id, w.t, w.p, CAST(SUM(e.v * w.w) AS BIGINT) AS d
      FROM {src} e JOIN {p}w w USING (i) GROUP BY e.vec_id, w.t, w.p),
    {p}buck AS MATERIALIZED (
      SELECT vec_id, t,
             CAST(SUM(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS b
      FROM {p}dots GROUP BY vec_id, t),
    {p}pb AS MATERIALIZED (SELECT t, b AS pbkt FROM {p}buck WHERE vec_id = {probe}),
    {p}cand AS MATERIALIZED (
      SELECT DISTINCT b.vec_id
      FROM {p}buck b JOIN {p}pb pb USING (t)
      WHERE bit_count(xor(b.b, pb.pbkt)) <= {MULTIPROBE_FLIPS}
        AND b.vec_id <> {probe})"""


_LSH_CAND_CTES = _lsh_cand_ctes()

_LSH_ORACLE = f"""
    WITH e AS ({_SQL_E}),
    {_LSH_CAND_CTES},
    {_SQL_RERANK}
"""


def _ivf_ctes() -> list:
    """The IVF pipeline as a CTE list ending at ``cand`` (probed-cell
    candidate vec_ids) — shared by the plain-IVF oracle (which appends the
    evidence re-rank) and the IVF-PQ oracle (which appends the PQ
    codebook/ADC pipeline)."""
    # n2 > 0 mirrors _cell_assignments' zero-norm-centroid exclusion
    asg = (
        "{a} AS (SELECT vec_id, cell FROM ("
        "SELECT d.vec_id, d.cell, ROW_NUMBER() OVER ("
        "PARTITION BY d.vec_id ORDER BY d.dot / sqrt(n.n2) DESC, d.cell) AS rn "
        "FROM {d} d JOIN {n} n USING (cell) WHERE n.n2 > 0) t WHERE rn = 1)"
    )
    ctes = [
        f"e AS ({_SQL_E})",
        (
            "seed AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)"
            " AS cell, vec_id FROM (SELECT DISTINCT vec_id FROM e"
            f" WHERE vec_id < {N_CENTROIDS}) s)"
        ),
        "c0 AS (SELECT s.cell, e.i, e.v AS c FROM seed s JOIN e USING (vec_id))",
    ]
    for k in range(KMEANS_ITERS + 1):
        ctes.append(
            f"n{k} AS (SELECT cell, CAST(SUM(c*c) AS DOUBLE) AS n2"
            f" FROM c{k} GROUP BY cell)"
        )
        ctes.append(
            f"d{k} AS (SELECT e.vec_id, c.cell, CAST(SUM(e.v * c.c) AS DOUBLE) AS dot"
            f" FROM e JOIN c{k} c USING (i) GROUP BY e.vec_id, c.cell)"
        )
        ctes.append(asg.format(a=f"a{k}", d=f"d{k}", n=f"n{k}"))
        if k < KMEANS_ITERS:
            ctes.append(
                f"m{k} AS (SELECT a.cell, e.i,"
                " CAST(round(CAST(SUM(e.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c"
                f" FROM a{k} a JOIN e USING (vec_id) GROUP BY a.cell, e.i)"
            )
            ctes.append(
                f"c{k + 1} AS (SELECT c.cell, c.i, COALESCE(m.c, c.c) AS c"
                f" FROM c{k} c LEFT JOIN m{k} m ON m.cell = c.cell AND m.i = c.i)"
            )
    K = KMEANS_ITERS
    ctes.append(
        "pcells AS (SELECT cell FROM (SELECT d.cell, ROW_NUMBER() OVER ("
        "ORDER BY d.dot / sqrt(n.n2) DESC, d.cell) AS rn "
        f"FROM d{K} d JOIN n{K} n USING (cell)"
        f" WHERE d.vec_id = {QUERY_VEC_ID} AND n.n2 > 0) t"
        f" WHERE rn <= {N_PROBE})"
    )
    ctes.append(
        f"cand AS (SELECT a.vec_id FROM a{K} a JOIN pcells USING (cell)"
        f" WHERE a.vec_id <> {QUERY_VEC_ID})"
    )
    # MATERIALIZED: same exponential-inlining guard as _pq_ann_ctes
    return [c.replace(" AS (", " AS MATERIALIZED (", 1) for c in ctes]


def _ivf_oracle() -> str:
    """DuckDB rendition of the FULL quantized IVF pipeline — seed centroids,
    KMEANS_ITERS Lloyd iterations (integer means, engine-rounded), final
    assignment, probe-cell selection, candidate re-rank, evidence columns.
    Every arithmetic step is either exact integer math or a single
    correctly-rounded double op (sqrt / divide on exactly-representable
    ints), so it reproduces Spark bit-for-bit."""
    return "WITH " + ",\n    ".join(_ivf_ctes()) + ",\n" + _SQL_RERANK


def _cell_assignments(eq: DataFrame, cents: dict) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment via broadcast-joined
    INTEGER centroid tables — centroids are data, not expression nodes (16
    ``cosine_similarity(vec, F.array(lit...))`` lambdas = 1024 literal
    nodes costing seconds of Catalyst analysis per build, and falling out
    of codegen — same lesson as ``lsh_buckets``).

    ``eq`` is the pre-quantized exploded (vec_id, pos, v) view.  The metric
    is ``dot / sqrt(|c|²)`` — argmax equals argmax of cosine since |v| is
    constant across cells — computed as exact LONG dot and sum-of-squares
    cast to double, one sqrt, one divide: bit-identical in DuckDB.  Ties
    break to the LOWEST cell index (max over (metric, -cell) structs).

    Zero-norm centroids are EXCLUDED from the metric: a degenerate cell
    (all-empty-text seed or mean collapse) would score 0/0 = NaN, and
    Spark's struct-max sorts NaN above every real cosine — every vector
    would silently assign to the degenerate cell.  Filtering n2 = 0 rows
    out of the broadcast table makes such a cell simply unassignable
    (mirrored by ``n2 > 0`` in the IVF oracle CTEs)."""
    spark = eq.sparkSession
    ct = local_rows_df(
        spark,
        [
            (cell, pos, int(c))
            for cell, vec in cents.items()
            for pos, c in enumerate(vec)
        ],
        "cell int, pos int, c long",
    )
    n2 = local_rows_df(
        spark,
        [(cell, int(sum(c * c for c in vec))) for cell, vec in cents.items()],
        "cell int, n2 long",
    ).filter(F.col("n2") > 0)
    dots = (
        eq.join(F.broadcast(ct), "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("v") * F.col("c")).alias("dot"))
    )
    metric = F.col("dot").cast("double") / F.sqrt(F.col("n2").cast("double"))
    best = (
        dots.join(F.broadcast(n2), "cell")
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(metric.alias("m"), (-F.col("cell")).alias("nc"))
            ).alias("best")
        )
    )
    return best.select("vec_id", (-F.col("best.nc")).cast("int").alias("cell"))


def _kmeans_refine(eq: DataFrame, cents: dict, iters: int = KMEANS_ITERS) -> dict:
    """Lloyd iterations over the corpus: assign → per-cell per-dimension
    INTEGER mean (``round(sum/count)`` evaluated ENGINE-side — Python
    round() is banker's) → new centroids; empty cells keep their old
    centroid.  Each iteration is one assignment pass + one (cell, dim)
    aggregate — at scale a single shuffle of (16 cells × 64 dims) partial
    sums, nothing proportional to the corpus.  Fully deterministic: integer
    sums commute, so partitioning cannot move a centroid by one ULP."""
    dim = len(next(iter(cents.values())))
    for _ in range(iters):
        means = (
            eq.join(_cell_assignments(eq, cents), "vec_id")
            .groupBy("cell", "pos")
            .agg(
                F.round(F.sum("v").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("c")
            )
            .collect()
        )
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["c"]
        cents = {
            cell: (
                [by_cell[cell][p] for p in range(dim)]
                if cell in by_cell and len(by_cell[cell]) == dim
                else old
            )
            for cell, old in cents.items()
        }
    return cents


@query("similarity_ivf_topk", oracle=_ivf_oracle())
def similarity_ivf_topk(spark, sf_dir):
    import math

    e = load_table(spark, sf_dir, "embeddings")
    eq = e.select(
        "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
    ).localCheckpoint()
    seeds = sorted(
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", quantized("embedding").alias("q"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = {i: [int(x) for x in r["q"]] for i, r in enumerate(seeds)}
    cents = _kmeans_refine(eq, cents)

    # the probe is among the seed rows whenever QUERY_VEC_ID < N_CENTROIDS —
    # reuse that collect instead of launching a second scan-and-quantize job
    probe_rows = [r for r in seeds if r["vec_id"] == QUERY_VEC_ID]
    qvec = (
        [int(x) for x in probe_rows[0]["q"]] if probe_rows else _probe_qvec(e)
    )
    # probe-cell ranking: exact int dots + one sqrt/divide — same doubles
    # the oracle's window computes
    def metric(vec):
        d = sum(q * c for q, c in zip(qvec, vec))
        return d / math.sqrt(sum(c * c for c in vec))

    # zero-norm centroids are unassignable (see _cell_assignments) and would
    # divide by zero here — skip them when ranking probe cells
    pcells = sorted(
        (c for c in cents if any(cents[c])),
        key=lambda cell: (-metric(cents[cell]), cell),
    )[:N_PROBE]
    assigned = _cell_assignments(eq, cents)
    cand = assigned.filter(
        F.col("cell").isin(pcells) & (F.col("vec_id") != QUERY_VEC_ID)
    ).select("vec_id")
    return _ann_result(e, cand, qvec)


similarity_ivf_topk.__doc__ = f"""ANN via IVF (inverted-file index):
    k-means centroids (deterministic seed sample + {KMEANS_ITERS} Lloyd
    refinement iterations), assign every vector to its nearest centroid; a
    probe scans only the {N_PROBE} closest of {N_CENTROIDS} cells before
    exact re-ranking.  The WHOLE pipeline runs on quantized integers
    (centroids included — means are engine-rounded to longs), so despite
    being approximate it is deterministically reproducible: the DuckDB
    oracle re-derives centroids, assignments, probe cells, candidates, and
    the re-ranked top-10, and the result's ``recall_at_10`` /
    ``cand_frac`` evidence columns are exact integer ratios inside the
    driver hash (floor also asserted in tests/test_advanced.py).

    Scale: assignment is an explode + broadcast-joined centroid-table pass
    (``_cell_assignments`` — centroids as data keep the plan small and
    codegen'd); each Lloyd iteration shuffles only (16×64) partial sums;
    with a cell-partitioned layout the probe becomes partition-pruned I/O,
    the same trajectory as the LSH variant."""


@query("similarity_lsh_bucketed", oracle=_LSH_ORACLE)
def similarity_lsh_bucketed(spark, sf_dir):
    from functools import reduce
    from operator import or_

    e = load_table(spark, sf_dir, "embeddings")
    # localCheckpoint (not cache): probe lookup + candidate scan consume it;
    # storage is released on GC.  At ingest-scale the bucket columns are
    # persisted storage, not a runtime materialization.  The quantized
    # embedding rides along so ONE probe collect yields both the bucket ids
    # and the probe vector (no second scan-and-quantize job).
    bucketed = e.select(
        "vec_id", quantized("embedding").alias("q")
    ).join(lsh_buckets(e), "vec_id").localCheckpoint()
    probe = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qvec = [int(x) for x in probe["q"]]
    conds = [
        F.bit_count(
            F.col(f"b{t}").bitwiseXOR(F.lit(int(probe[f"b{t}"])))
        )
        <= MULTIPROBE_FLIPS
        for t in range(N_TABLES)
    ]
    cand = bucketed.filter(
        reduce(or_, conds) & (F.col("vec_id") != QUERY_VEC_ID)
    ).select("vec_id")
    return _ann_result(e, cand, qvec)


def _tb_membership(bucketed: DataFrame) -> DataFrame:
    """(vec_id, t, b): one row per (vector, LSH table) bucket membership."""
    return bucketed.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"), F.col(f"b{t}").alias("b")
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))


def _pair_join(df: DataFrame, keys: list) -> DataFrame:
    """Bucket-local candidate self-join: (vec_a < vec_b) pairs sharing all
    ``keys``.  Cost is Σ over buckets of m² — callers must size-gate."""
    from functools import reduce
    from operator import and_

    a, b = df.alias("a"), df.alias("b")
    cond = reduce(
        and_, [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    ) & (F.col("a.vec_id") < F.col("b.vec_id"))
    return a.join(b, cond).select(
        F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
    )


R_REFINE = 2  # held-out refinement tables for hot-bucket splitting


def _refine_buckets(qdf: DataFrame) -> DataFrame:
    """(vec_id, rt, rb): R_REFINE independent PLANES_PER_TABLE-bit
    refinement buckets from fresh hyperplane tables (indices N_TABLES..,
    never used by ``lsh_buckets``, so the bits are independent of every
    level-0 bucket).  More than one refine table for the same reason the
    outer scheme has 12: a near-identical duplicate class sitting ON one
    refine table's boundary splits there, but almost never in BOTH —
    OR-amplification keeps the class connected.  Same broadcast-weights
    formulation as ``lsh_buckets``, restricted to the (small) hot-member
    set the caller passes in."""
    spark = qdf.sparkSession
    weights = local_rows_df(
        spark,
        [
            (rt, p, pos, w)
            for rt in range(R_REFINE)
            for p, plane in enumerate(_planes(N_TABLES + rt))
            for pos, w in enumerate(plane)
        ],
        "rt int, p int, pos int, w long",
    )
    ex = qdf.select("vec_id", F.posexplode("q").alias("pos", "v"))
    dots = (
        ex.join(F.broadcast(weights), "pos")
        .groupBy("vec_id", "rt", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("d"))
    )
    return dots.groupBy("vec_id", "rt").agg(
        F.sum(
            F.when(F.col("d") >= 0, F.expr("shiftleft(1, p)")).otherwise(0)
        )
        .cast("long")
        .alias("rb")
    )


def _near_dup_staging(
    e: DataFrame, max_bucket: int, index: DataFrame | None
):
    """Shared candidate staging for ``cosine_near_dup_pairs`` AND
    ``near_dup_hot_bucket_diag`` — ONE definition so the diagnostic can
    never drift from the operator it observes.  Returns ``(q, tbs,
    hot_r2)``: quantized vectors, level-0 (vec, table, bucket) memberships
    with bucket size ``n`` attached, and hot-bucket memberships refined
    under the held-out tables with sub-bucket size ``n2`` attached."""
    bucketed = index if index is not None else lsh_buckets(e)
    q = (
        index.select("vec_id", "q")
        if index is not None and "q" in index.columns
        else e.select("vec_id", quantized("embedding").alias("q"))
    )
    tb = _tb_membership(bucketed)
    sizes = tb.groupBy("t", "b").agg(F.count(F.lit(1)).alias("n"))
    tbs = tb.join(sizes, ["t", "b"])
    hot = tbs.filter(F.col("n") > max_bucket).select("vec_id", "t", "b")
    rb = _refine_buckets(q.join(hot.select("vec_id").distinct(), "vec_id"))
    hot_r = hot.join(rb, "vec_id")
    sizes2 = hot_r.groupBy("t", "b", "rt", "rb").agg(
        F.count(F.lit(1)).alias("n2")
    )
    hot_r2 = hot_r.join(sizes2, ["t", "b", "rt", "rb"])
    return q, tbs, hot_r2


def cosine_near_dup_pairs(
    e: DataFrame, threshold: float = 0.9, max_bucket: int = 1024,
    index: DataFrame | None = None, hot_policy: str = "refine"
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at scale: LSH-bucket candidate
    generation + exact re-rank — never an all-pairs product.

    The oracle-checked ``similarity_pairs_threshold`` keeps its quadratic
    join honest with an id-range bound; this is the unbounded-corpus
    production path.  Candidates are id pairs sharing an EXACT bucket in
    ANY of the {N_TABLES} tables (for true near-dups the collision
    probability per table is high — cos 0.99 ⇒ ~0.53 per 14-bit table ⇒
    ~0.9998 across 12 — while unrelated pairs almost never collide), so
    the join is bucket-local: cost is Σ over buckets of m², never corpus².
    The bucket join carries only (vec_id, bucket) ids — quantized vectors
    join in AFTER pair dedup, so the wide arrays never ride the candidate
    shuffle.

    Hot buckets (> ``max_bucket`` members) would reintroduce the quadratic
    blow-up, and a web corpus hits them in BOTH degenerate shapes, which
    need different treatment (``hot_policy="refine"``, the default):

    - a heterogeneous crowd (e.g. the near-zero region): members get
      ``R_REFINE`` fresh ``PLANES_PER_TABLE``-bit refinement buckets from
      held-out hyperplane tables (``_refine_buckets``) and sub-buckets
      back under the cap pair normally — unrelated members split apart,
      genuine near-dups still collide in at least one refine table;
    - one giant duplicate class (boilerplate mirrors — (near-)identical
      vectors land on the SAME side of every added hyperplane, so no
      amount of re-bucketing splits them, and their m² pairs are all
      real): sub-buckets STILL over the cap fall back to a STAR — each
      member verifies against the bucket's min-id hub only, O(m) not
      O(m²), and the duplicate class survives as one connected component
      for the downstream canonicalizer.

    ``hot_policy="drop"`` preserves the old skew-guard behavior (hot
    buckets excluded); ``near_dup_hot_bucket_diag`` makes either policy's
    coverage observable.

    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b and
    cos_sim ≥ threshold.  Pass ``index=build_lsh_index(e)`` to reuse the
    ingest-time bucket/vector artifact across this and the top-k probes."""
    if hot_policy not in ("refine", "drop"):
        raise ValueError(f"hot_policy must be 'refine' or 'drop', got {hot_policy!r}")
    q, tbs, hot_r2 = _near_dup_staging(e, max_bucket, index)
    cand = _pair_join(
        tbs.filter(F.col("n") <= max_bucket), ["t", "b"]
    )
    if hot_policy == "refine":
        cand_refined = _pair_join(
            hot_r2.filter(F.col("n2") <= max_bucket), ["t", "b", "rt", "rb"]
        )
        star = hot_r2.filter(F.col("n2") > max_bucket)
        hubs = star.groupBy("t", "b", "rt", "rb").agg(
            F.min("vec_id").alias("hub")
        )
        cand_star = (
            star.join(hubs, ["t", "b", "rt", "rb"])
            .filter(F.col("vec_id") != F.col("hub"))
            .select(
                F.col("hub").alias("vec_a"), F.col("vec_id").alias("vec_b")
            )
        )
        cand = cand.unionByName(cand_refined).unionByName(cand_star)
    cand = cand.distinct()
    pairs = cand.join(
        q.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa")),
        "vec_a",
    ).join(
        q.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb")),
        "vec_b",
    )
    dot = qdot(F.col("qa"), F.col("qb")).cast("double")
    na = qdot(F.col("qa"), F.col("qa")).cast("double")
    nb = qdot(F.col("qb"), F.col("qb")).cast("double")
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return pairs.select("vec_a", "vec_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def near_dup_hot_bucket_diag(
    e: DataFrame, max_bucket: int = 1024, index: DataFrame | None = None
) -> DataFrame:
    """Coverage diagnostic for ``cosine_near_dup_pairs``: one row per stage
    with (stage, n_buckets, n_rows) —

    - ``safe``: level-0 buckets under the cap (full pair join);
    - ``refined``: hot-bucket sub-buckets under the cap after the held-out
      hyperplane split (full pair join within the sub-bucket);
    - ``star``: sub-buckets still over the cap (hub-verify only — the rows
      the old drop policy silently lost, now the observable quantity).

    Row counts are (vec, table)-memberships, matching the candidate-join
    input cardinality.  Cheap: the same two size aggregations the operator
    itself runs, no pair join."""
    _, tbs, hot_r2 = _near_dup_staging(e, max_bucket, index)
    safe = (
        tbs.filter(F.col("n") <= max_bucket)
        .groupBy()
        .agg(
            F.lit("safe").alias("stage"),
            F.countDistinct("t", "b").alias("n_buckets"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    refined = (
        hot_r2.filter(F.col("n2") <= max_bucket)
        .groupBy()
        .agg(
            F.lit("refined").alias("stage"),
            F.countDistinct("t", "b", "rt", "rb").alias("n_buckets"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    star = (
        hot_r2.filter(F.col("n2") > max_bucket)
        .groupBy()
        .agg(
            F.lit("star").alias("stage"),
            F.countDistinct("t", "b", "rt", "rb").alias("n_buckets"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return safe.unionByName(refined).unionByName(star)


similarity_lsh_bucketed.__doc__ = f"""ANN via multi-table, multi-probe
    random-hyperplane LSH: {N_TABLES} independent tables of
    {PLANES_PER_TABLE} sign bits each; a candidate is any vector whose
    bucket in ANY table is within Hamming distance {MULTIPROBE_FLIPS} of
    the probe's bucket (OR-amplification across tables + multi-probe
    within a table — the two standard recall levers for sign-LSH, cf. Lv
    et al., "Multi-probe LSH"); exact cosine re-ranks candidates.  The
    plane weights are md5-derived INTEGERS and the dots are long sums, so
    bucket assignment is order-independent and engine-reproducible: the
    DuckDB oracle re-derives the planes (same md5), buckets, candidate
    set, and re-ranked top-10 — approximate yet driver-green on
    rows+schema+hash, with ``recall_at_10`` / ``cand_frac`` evidence
    columns inside the hash (floor also asserted in
    tests/test_advanced.py).

    Scale: bucket columns are computed once at ingest (``lsh_buckets`` —
    one explode+aggregate pass, fully codegen'd).  THIS evidence variant
    probes with a ``bit_count(xor)`` predicate, which must scan every
    bucket row; the production entry point (``ann_topk_lsh``) instead
    enumerates the Hamming ball as an explicit bucket-id IN-set
    (``hamming_ball``, 470 ids/table), which a bucket-partitioned layout
    prunes to the probed partitions — that path, not this one, is the
    100 TB read pattern.

    Parameter choice (DuckDB sweep over tables∈{{8..28}} × planes∈{{14..20}}
    × flips∈{{1..5}}, all three SFs — reproducible BECAUSE the pipeline is
    SQL-derivable): the corpus is measured ISOTROPIC — the probe's true
    top-10 sit at cosine 0.25–0.37 against a bulk p90 of 0.16, giving
    sign-LSH only ~0.59-vs-0.50 per-bit discrimination — so recall 0.9
    cannot be bought below cand_frac ≈ 0.27 by ANY data-independent config
    (best observed: 12×20-bit/flips-5 = 0.27 but recall drops to 0.8 at
    sf0.1; the shipped 12×14/flips-3 holds recall 0.9 at sf0.01 AND sf0.1
    at cand_frac ≈ 0.33–0.34, the Pareto point that is stable across
    scales).  A cand_frac ≤ 0.10 target at recall ≥ 0.9 is unreachable on
    this data family; on a genuinely clustered corpus the same pipeline
    reaches it by raising planes (buckets shrink with cluster density)."""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-shaped: embedding near-dup groups → canonical)
# ---------------------------------------------------------------------------


def semantic_dedup(
    e: DataFrame,
    threshold: float = 0.9,
    max_bucket: int = 1024,
    index: DataFrame | None = None,
) -> DataFrame:
    """Embedding-space deduplication, end to end (the SemDeDup recipe,
    Abbas et al. 2023, rebuilt on this engine's scale primitives): bucketed
    near-dup PAIR generation (``cosine_near_dup_pairs`` — LSH candidate
    buckets, hot-bucket refine/star fallback, exact cosine verify) →
    connected components over the verified pairs (size-gated union-find /
    label propagation, ``operators/clustering.py``) → keep the smallest
    vec_id per semantic group.

    Returns (vec_id, canonical_id, is_canonical) for EVERY input vector —
    vectors with no near-dup are their own canonical (left join + coalesce,
    no extra pass).  Downstream, a training pipeline keeps
    ``is_canonical`` rows or joins ``canonical_id`` back to documents.

    Scale posture is inherited entirely from the two building blocks: no
    all-pairs product, candidate shuffles carry ids, components run
    O(log n) rounds only above the small-graph gate.  Pass
    ``index=build_lsh_index(e)`` to reuse the ingest artifact."""
    from .clustering import connected_components

    pairs = cosine_near_dup_pairs(
        e, threshold, max_bucket=max_bucket, index=index
    ).select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    comp = connected_components(pairs)
    out = e.select("vec_id").join(
        comp.select(F.col("id").alias("vec_id"), "component"),
        "vec_id",
        "left",
    )
    canonical = F.coalesce("component", F.col("vec_id"))
    return out.select(
        "vec_id",
        canonical.alias("canonical_id"),
        (canonical == F.col("vec_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# IVF-PQ driver slot (round 9): the full production composition, oracled
# ---------------------------------------------------------------------------


def _ivf_pq_oracle() -> str:
    """DuckDB rendition of the FULL ``ann_topk_ivf_pq`` pipeline: the IVF
    CTEs (shared via :func:`_ivf_ctes` — seeds, Lloyd rounds, probe cells,
    candidate set), then PQ codebook training (first-``PQ_CODES``-vectors
    seeding, ``KMEANS_ITERS`` joint Lloyd rounds with engine-side
    ``round(sum/count)`` integer means, empty codes keeping their
    centroid), exact-integer-L2 code assignment with the (d2, code)
    tie-break, the broadcast-ADC approximate scoring with the zero-norm
    ``-1`` sentinel, the ``k × rerank_mult`` shortlist, and the exact
    integer-cosine re-rank.  Same determinism discipline as
    ``_ivf_oracle``: every reduction is exact integer math; every double
    op (sqrt, divide, the multiply in the denominator) is a single
    correctly-rounded step performed in the same order as the Spark
    expressions, so the scores — and therefore the sort and both cuts —
    reproduce bit-for-bit."""
    K = 10
    ctes = list(_ivf_ctes())
    ctes.extend(_pq_ann_ctes(k=K, mult=PQ_RERANK_MULT))
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    SELECT vec_id, dot / (sqrt(nv) * sqrt(nq)) AS cos_sim"
        f" FROM scored2 ORDER BY cos_sim DESC, vec_id LIMIT {K}"
    )


def _pq_ann_ctes(
    k: int,
    mult: int,
    src: str = "e",
    qsrc: str = "e",
    probe: int = QUERY_VEC_ID,
    cand: str = "cand",
    p: str = "",
    reuse_train: str | None = None,
) -> list:
    """CTE fragments for the PQ half of an ANN oracle, parameterized by the
    re-rank cut (``k × mult`` shortlist, exact re-rank of CTE
    ``{p}scored2``).  Assumes CTEs ``src`` (quantized exploded TRAINING
    vectors — the corpus), ``qsrc`` (the relation holding the probe vector
    under id ``probe`` — equals ``src`` for query-by-example, corpus∪query
    for a free-text query), and ``cand`` (the candidate vec_id set — IVF
    probed cells or the LSH multiprobe ball) already exist; the caller
    selects the final top-``k`` from ``{p}scored2``.  ``p`` prefixes every
    CTE name so one statement can run TWO PQ pipelines (the hybrid slot's
    example + free-text branches).  Shared by ``_ivf_pq_oracle`` and the
    hybrid-retrieval oracle so the PQ-training SQL can never drift between
    the slots.

    ``reuse_train`` (round 13): prefix of an ALREADY-EMITTED chain whose
    trained codebook (``{t}pc{IT}``) and corpus assignments
    (``{t}pa{IT}``) this chain should probe instead of re-training — the
    codebook depends only on ``src``, so two probes over the same corpus
    (the hybrid slot's two batch queries over ``fe``) must not pay for —
    or rely on the engine to deduplicate — two identical Lloyd runs."""
    S, C, IT = PQ_SUBSPACES, PQ_CODES, KMEANS_ITERS
    SD = 64 // S
    K, MULT, Q = k, mult, probe
    tp = reuse_train if reuse_train is not None else p
    ctes = []
    if reuse_train is not None:
        return [
            c.replace(" AS (", " AS MATERIALIZED (", 1)
            for c in _pq_probe_ctes(K, MULT, IT, SD, src, qsrc, Q, cand, p, tp)
        ]
    ctes.append(
        f"{p}px AS (SELECT vec_id, CAST((i-1)//{SD} AS INTEGER) AS s,"
        f" CAST((i-1)%{SD} AS INTEGER) AS p, v FROM {src})"
    )
    ctes.append(
        f"{p}pseed AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1"
        " AS INTEGER) AS code, vec_id FROM"
        f" (SELECT DISTINCT vec_id FROM {src} ORDER BY vec_id LIMIT {C}) t)"
    )
    ctes.append(
        f"{p}pc0 AS (SELECT px.s, sd.code, px.p, px.v AS c"
        f" FROM {p}pseed sd JOIN {p}px px USING (vec_id))"
    )
    for k in range(IT + 1):
        ctes.append(
            f"{p}pd{k} AS (SELECT px.vec_id, px.s, c.code,"
            " SUM((px.v - c.c) * (px.v - c.c)) AS d2"
            f" FROM {p}px px JOIN {p}pc{k} c ON c.s = px.s AND c.p = px.p"
            " GROUP BY px.vec_id, px.s, c.code)"
        )
        ctes.append(
            f"{p}pa{k} AS (SELECT vec_id, s, code FROM ("
            "SELECT vec_id, s, code, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id, s ORDER BY d2, code) AS rn"
            f" FROM {p}pd{k}) t WHERE rn = 1)"
        )
        if k < IT:
            ctes.append(
                f"{p}pm{k} AS (SELECT a.s, a.code, px.p,"
                " CAST(round(CAST(SUM(px.v) AS DOUBLE) / COUNT(*)) AS BIGINT)"
                f" AS c FROM {p}pa{k} a JOIN {p}px px"
                " ON px.vec_id = a.vec_id AND px.s = a.s"
                " GROUP BY a.s, a.code, px.p)"
            )
            ctes.append(
                f"{p}pc{k + 1} AS (SELECT c.s, c.code, c.p, COALESCE(m.c, c.c)"
                f" AS c FROM {p}pc{k} c LEFT JOIN {p}pm{k} m"
                " ON m.s = c.s AND m.code = c.code AND m.p = c.p)"
            )
    ctes.extend(_pq_probe_ctes(K, MULT, IT, SD, src, qsrc, Q, cand, p, tp))
    # MATERIALIZED: the codebook chain references pc{k} three ways per
    # Lloyd round — inlined, DuckDB re-executes the training subtree
    # 3^iters times per consumer (the round-12 EMFILE lesson, logreg.py)
    return [c.replace(" AS (", " AS MATERIALIZED (", 1) for c in ctes]


def _pq_probe_ctes(
    K: int, MULT: int, IT: int, SD: int, src: str, qsrc: str, Q: int,
    cand: str, p: str, tp: str,
) -> list:
    """The probe half of :func:`_pq_ann_ctes` — ADC LUT against the
    trained codebook ``{tp}pc{IT}`` / assignments ``{tp}pa{IT}``, ADC
    shortlist, exact integer-cosine re-rank.  ``tp`` = the prefix that
    emitted the training chain (== ``p`` unless ``reuse_train``)."""
    ctes = []
    ctes.append(
        f"{p}qsub AS (SELECT CAST((i-1)//{SD} AS INTEGER) AS s,"
        f" CAST((i-1)%{SD} AS INTEGER) AS p, v FROM {qsrc} WHERE vec_id = {Q})"
    )
    ctes.append(
        f"{p}lut AS (SELECT c.s, c.code, SUM(q.v * c.c) AS pdot,"
        f" SUM(c.c * c.c) AS pn2 FROM {tp}pc{IT} c JOIN {p}qsub q"
        " ON q.s = c.s AND q.p = c.p GROUP BY c.s, c.code)"
    )
    ctes.append(
        f"{p}qn AS (SELECT sqrt(CAST(SUM(v * v) AS DOUBLE)) AS qn"
        f" FROM {qsrc} WHERE vec_id = {Q})"
    )
    ctes.append(
        f"{p}approx AS (SELECT a.vec_id, SUM(l.pdot) AS adot, SUM(l.pn2) AS an2"
        f" FROM {tp}pa{IT} a JOIN {p}lut l ON l.s = a.s AND l.code = a.code"
        f" JOIN {cand} cd ON cd.vec_id = a.vec_id GROUP BY a.vec_id)"
    )
    ctes.append(
        f"{p}ascore AS (SELECT ap.vec_id, CASE WHEN an2 > 0 AND qn.qn > 0"
        " THEN CAST(adot AS DOUBLE) / (sqrt(CAST(an2 AS DOUBLE)) * qn.qn)"
        f" ELSE -1.0 END AS approx_cos FROM {p}approx ap, {p}qn qn)"
    )
    ctes.append(
        f"{p}short AS (SELECT vec_id FROM {p}ascore"
        f" ORDER BY approx_cos DESC, vec_id LIMIT {K * MULT})"
    )
    ctes.append(
        f"{p}scored2 AS (SELECT e.vec_id, CAST(SUM(e.v * q2.v) AS DOUBLE) AS dot,"
        " CAST(SUM(e.v * e.v) AS DOUBLE) AS nv,"
        " CAST(SUM(q2.v * q2.v) AS DOUBLE) AS nq"
        f" FROM {src} e JOIN (SELECT v, i FROM {qsrc} WHERE vec_id = {Q}) q2 USING (i)"
        f" JOIN {p}short sh ON sh.vec_id = e.vec_id GROUP BY e.vec_id)"
    )
    return ctes


@query("ann_topk_ivf_pq", oracle=_ivf_pq_oracle())
def similarity_ivf_pq_topk(spark, sf_dir):
    """Driver slot for :func:`ann_topk_ivf_pq` — the production IVF-PQ
    composition (Jégou et al.; FAISS's ``IVFx,PQy`` configuration): IVF
    k-means + probed-cell candidates, PQ codebook training + ADC
    first-pass scoring against the broadcast per-query lookup table, and
    an exact integer-cosine re-rank of only the top ``k × rerank_mult``
    approximate hits.  The oracle re-derives BOTH trainings and the ADC
    arithmetic end to end in SQL, so the entire two-index pipeline —
    not just the re-rank — is hash-checked."""
    e = load_table(spark, sf_dir, "embeddings")
    return ann_topk_ivf_pq(e, k=10)


# ---------------------------------------------------------------------------
# Round-9: persisted cell-partitioned IVF index (the on-disk ANN artifact)
# ---------------------------------------------------------------------------

IVF_INDEX_VERSION = 1


def persist_ivf_index(
    e: DataFrame, path: str, owner: str | None = None
) -> None:
    """Write ``build_ivf_index``'s artifact to disk in the layout its
    docstring promises: ``cells/`` is the (vec_id, q) table HIVE-PARTITIONED
    on the IVF cell, so a probe's ``cell IN (probed…)`` filter prunes at
    the DIRECTORY level — only ``N_PROBE``/``N_CENTROIDS`` of the stored
    bytes are ever listed, let alone read (PartitionFilters evidence in
    tests/test_ivf_persisted.py); ``centroids/`` is the 16×64 integer
    centroid table (tiny — the probe collects it to rank cells
    driver-side, the same arithmetic as the in-memory path); ``meta/``
    pins version + the k-means configuration so a probe fails loudly
    against an index trained under different constants.

    This is the same ingest-artifact discipline as the BM25 and MinHash
    indexes: one corpus-pass build amortized across every subsequent
    query, with the probe cost bounded by the probed partitions — and
    the same round-10 single-writer lease (``manifest.index_writer_lock``)
    excluding concurrent mutators."""
    from ..sources.manifest import index_writer_lock

    spark = e.sparkSession
    with index_writer_lock(spark, path, owner):
        cents, assigned = build_ivf_index(e)
        (
            assigned.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/cells")
        )
        # single-slice local frame: one Python-worker evaluation, one
        # output file, input row order preserved (local_rows_df replaced
        # the coalesce(1) form whose single task evaluated all 32
        # parallelize slices serially, ~150 ms apiece)
        local_rows_df(
            spark,
            [
                (cell, pos, int(c))
                for cell, vec in cents.items()
                for pos, c in enumerate(vec)
            ],
            "cell int, pos int, c long",
        ).write.mode("overwrite").parquet(f"{path}/centroids")
        spark.createDataFrame(
            [(IVF_INDEX_VERSION, N_CENTROIDS, N_PROBE, KMEANS_ITERS)],
            "version int, n_centroids int, n_probe int, kmeans_iters int",
        ).write.mode("overwrite").parquet(f"{path}/meta")


def _check_ivf_meta(spark, path: str) -> None:
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    got = (m["version"], m["n_centroids"], m["n_probe"], m["kmeans_iters"])
    want = (IVF_INDEX_VERSION, N_CENTROIDS, N_PROBE, KMEANS_ITERS)
    if got != want:
        raise ValueError(
            f"IVF index at {path} was built with {got}, this build "
            f"expects {want} — rebuild the index"
        )


def ann_topk_ivf_persisted(
    spark, path: str, k: int = 10, query_vec_id: int = QUERY_VEC_ID,
    qvec=None,
) -> DataFrame:
    """IVF ANN top-k served from the on-disk index — identical results to
    ``ann_topk_ivf`` over the same corpus (parity-tested), but the
    candidate scan touches ONLY the probed cells' partitions: centroids
    load driver-side (16 rows) and the candidate read carries
    ``cell IN (probed)`` as a partition filter.  The 100-TB shape: probe
    cost is |probed cells| / |cells| of the artifact, independent of
    corpus size.

    ``qvec``: pass the query's QUANTIZED vector directly (a serving tier
    holds query vectors anyway) to skip the by-id lookup.  Without it the
    id lookup scans one vec_id-sorted row group per cell partition —
    bounded, but a cross-partition read the caller can avoid."""
    _check_ivf_meta(spark, path)
    rows = spark.read.parquet(f"{path}/centroids").collect()
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["c"]
    cents = {
        cell: [v[p] for p in range(len(v))] for cell, v in by_cell.items()
    }
    cells = spark.read.parquet(f"{path}/cells")
    if qvec is None:
        qrow = cells.filter(F.col("vec_id") == query_vec_id).collect()
        if not qrow:
            raise ValueError(f"query vec_id {query_vec_id} not in the index")
        qvec = [int(x) for x in qrow[0]["q"]]
    else:
        qvec = [int(x) for x in qvec]
    pcells = _probe_cells(cents, qvec)
    cand_q = cells.filter(
        F.col("cell").isin(pcells) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id", "q")
    return _rerank_candidates(cand_q, qvec, k)


def extend_ivf_index(
    e_new: DataFrame, path: str, owner: str | None = None
) -> None:
    """Incrementally add a batch of vectors to a persisted IVF index —
    the FAISS ``add()`` contract: new vectors are assigned to the
    EXISTING centroids (no retraining — cost is O(batch), one broadcast
    assignment pass) and appended into their cells' hive partitions, so
    the very next probe sees them with no other change.  Batch vec_ids
    must be disjoint from the indexed corpus (dedup upstream, the same
    assumption as every other index extend here).

    Centroid drift is the documented trade: a corpus whose distribution
    moves will pack new mass into few cells and probe recall decays —
    re-train by re-running :func:`persist_ivf_index` over the union when
    cell-size diagnostics (`cells/` row counts per partition) skew.
    Holds the single-writer lease: an extend racing a retrain
    (``persist_ivf_index`` overwrite) would otherwise be lost."""
    from ..sources.manifest import index_writer_lock

    spark = e_new.sparkSession
    with index_writer_lock(spark, path, owner):
        _check_ivf_meta(spark, path)
        rows = spark.read.parquet(f"{path}/centroids").collect()
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["c"]
        cents = {
            cell: [v[p] for p in range(len(v))] for cell, v in by_cell.items()
        }
        eq = e_new.select(
            "vec_id", F.posexplode(quantized("embedding")).alias("pos", "v")
        ).localCheckpoint()
        assigned = (
            e_new.select("vec_id", quantized("embedding").alias("q"))
            .join(_cell_assignments(eq, cents), "vec_id")
        )
        (
            assigned.repartition("cell")
            .sortWithinPartitions("vec_id")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(f"{path}/cells")
        )


def ivf_cell_stats(spark, path: str) -> DataFrame:
    """Per-cell occupancy of a persisted IVF index — the retrain trigger
    ``extend_ivf_index`` documents: (cell, n_vecs, frac, balance) where
    ``balance`` = n_vecs / (total / n_cells), so 1.0 is perfectly even and
    a drifting corpus shows up as a few cells with balance >> 1 (their
    probes re-rank ever-larger candidate sets).  One partition-pruned
    count aggregate over the artifact's partition column — reads parquet
    footers' row counts, not vector data (the `cell` partition key plus a
    count(*) never touches the q column)."""
    _check_ivf_meta(spark, path)
    from pyspark.sql.window import Window as W

    counts = (
        spark.read.parquet(f"{path}/cells")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    # the per-cell relation is N_CENTROIDS rows — a global window over it
    # is driver-trivial, no second scan of the artifact
    total = F.sum("n_vecs").over(W.partitionBy())
    n_cells = F.count(F.lit(1)).over(W.partitionBy())
    return counts.select(
        "cell",
        "n_vecs",
        (F.col("n_vecs") / total).alias("frac"),
        (F.col("n_vecs") * n_cells / total).alias("balance"),
    ).orderBy("cell")
