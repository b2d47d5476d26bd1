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
from ..functions.localdf import local_rows_df
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
    exact: bool = False,
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
    JL guarantee with no error anywhere downstream.

    ``exact=True`` is the cross-engine-reproducible mode (the same recipe
    as ``logreg.train_classifier``): components round to 9 dp and sum as
    exact DECIMAL(20,9) — ±1 weights mean the products carry NO rounding
    at all, so the only float op left is the final 1/√out_dim scale,
    which this mode restricts to out_dim a perfect square of a power of
    two (÷2^k is an exponent shift, exact in IEEE — the scaled output is
    bit-identical in any summation order and any engine).  The default
    float path is ~2× faster and differs only by the usual sum-order ulp
    noise."""
    spark = e.sparkSession
    if exact:
        r = int(round(out_dim**0.5))
        if r * r != out_dim or r <= 0 or (r & (r - 1)) != 0:
            raise ValueError(
                "random_projection(exact=True) needs out_dim = (2^k)^2 so "
                "the 1/sqrt(out_dim) scale is an exact IEEE division "
                f"(got out_dim={out_dim})"
            )
    weights = local_rows_df(
        spark,
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
    if exact:
        # DECIMAL(20,9) overflows to NULL under non-ANSI mode, and a NULL
        # component silently drops out of the SUM — turn that corruption
        # into an execution-time error like the in_dim guard above
        bounded = F.when(
            F.abs(F.col("v")) < F.lit(1e11), F.col("v")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "random_projection(exact=True): |component| >= 1e11 "
                        "overflows the DECIMAL(20,9) reduction (got "
                    ),
                    F.col("v").cast("string"),
                    F.lit(")"),
                )
            )
        )
        term = F.round(bounded, 9).cast("decimal(20,9)") * F.col("w")
    else:
        term = F.col("v") * F.col("w")
    comps = (
        ex.join(F.broadcast(weights), "pos")
        .groupBy(id_col, "j")
        .agg(F.sum(term).alias("s"))
    )
    if exact:
        elem = lambda st: st["s"].cast("double") / F.lit(float(r))  # noqa: E731
    else:
        elem = lambda st: st["s"] * F.lit(scale)  # noqa: E731
    packed = comps.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "s"))), elem
        ).alias(out_col)
    )
    return e.join(packed, id_col, "left")
