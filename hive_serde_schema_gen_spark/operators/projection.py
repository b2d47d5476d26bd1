"""Johnson–Lindenstrauss random projection for embedding columns — the
dimensionality-reduction step in front of ANN / semantic dedup when vectors
arrive wider than the index needs (public result: Achlioptas 2003, ±1
entries preserve pairwise distances with the same guarantee as Gaussian).

Same engineering shape as ``similarity.lsh_buckets`` (see its docstring for
why): the projection matrix is deterministic pseudo-random DATA on a
broadcast-joined weights frame, not expression nodes — ``out_dim × in_dim``
per-component lambdas would drop out of codegen and bloat Catalyst
analysis.  One explode + broadcast hash join + two map-side-combined
aggregates + one join back on vec_id; every stage codegen'd, no Python
anywhere.  At 100 TB you run this once at ingest and persist the narrow
column next to (or instead of) the wide one — downstream LSH banding,
IVF cells, and PQ codes then all operate on ``out_dim`` floats.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rp_weight(seed: str, i: int, j: int) -> int:
    """Deterministic ±1 from md5(seed:i:j) — no RNG state, reproducible
    across runs and engines (same trick as ``similarity._planes``)."""
    h = int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def random_projection(
    e: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    seed: str = "rp-v1",
    id_col: str = "vec_id",
    col: str = "embedding",
    out_col: str = "embedding_rp",
) -> DataFrame:
    """Append ``out_col``: the input embedding projected to ``out_dim``
    dims, ``y_j = (1/√out_dim) · Σ_i x_i · s_ij`` with ``s_ij ∈ {±1}``
    drawn deterministically from (seed, i, j).

    Linear by construction (tested), so dot products — hence cosine
    similarity up to JL distortion ε ≈ √(ln n / out_dim) — survive the
    projection.  Rows keep all their other columns; a row with a NULL
    embedding keeps a NULL ``out_col`` (left join back) rather than
    silently vanishing.  A vector whose length differs from ``in_dim``
    raises at execution time (``assert_true`` guard) — the silent
    alternative would be projecting a truncated prefix, which voids the
    JL guarantee with no error anywhere downstream."""
    spark = e.sparkSession
    weights = spark.createDataFrame(
        [
            (i, j, _rp_weight(seed, i, j))
            for i in range(in_dim)
            for j in range(out_dim)
        ],
        "pos int, j int, w int",
    )
    scale = 1.0 / out_dim**0.5
    checked = F.when(
        F.col(col).isNull() | (F.size(col) == in_dim), F.col(col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"random_projection: embedding length != in_dim={in_dim} (got "),
                F.size(col).cast("string"),
                F.lit(")"),
            )
        )
    )
    ex = e.select(
        id_col, F.posexplode(checked.cast("array<double>")).alias("pos", "v")
    )
    comps = (
        ex.join(F.broadcast(weights), "pos")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    packed = comps.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "s"))),
            lambda st: st["s"] * F.lit(scale),
        ).alias(out_col)
    )
    return e.join(packed, id_col, "left")
