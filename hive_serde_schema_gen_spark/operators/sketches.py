"""Mergeable-sketch statistics (Apache DataSketches, built into Spark SQL):
the incremental monitoring layer of a 100-TB pipeline — per-source /
per-epoch sketch ARTIFACTS that answer distinct / overlap / quantile
questions later WITHOUT rescanning the data that produced them.

Why sketches and not exact aggregates:

- **Mergeable**: an HLL/Theta/KLL sketch of epoch 47 combines with epochs
  0–46 by a tiny ``*_union_agg`` over stored binaries — "distinct docs all
  time" costs O(epochs), not a rescan of 100 TB.
- **Set algebra without joins**: the Theta intersection estimates "how much
  of source A duplicates source B" from two KB-sized sketches — the exact
  answer is a distributed join of both sources.
- **Bounded size**: every sketch is KBs regardless of input cardinality,
  so the artifact table stays driver-readable forever.

All operators here are thin, typed wrappers over the SQL functions
(``hll_sketch_agg`` / ``theta_*`` / ``kll_*``) — one map-side-combined
aggregate to BUILD, metadata-sized frames ever after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_sketches(
    d: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Per-group sketch row: ``(group, rows, hll, theta[, kll])`` — the
    artifact to persist per source/epoch.  ``key_col`` feeds the distinct/
    overlap sketches (doc digest, URL, user id); ``value_col`` (numeric)
    feeds the KLL quantile sketch.  One aggregate pass; every sketch is
    map-side combined by Spark's partial aggregation."""
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.expr(f"hll_sketch_agg({key_col})").alias("hll"),
        F.expr(f"theta_sketch_agg({key_col})").alias("theta"),
    ]
    if value_col is not None:
        aggs.append(
            F.expr(f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE))").alias(
                "kll"
            )
        )
    return d.groupBy(F.col(group_col).alias("group")).agg(*aggs)


def union_distinct(sketches: DataFrame) -> int:
    """Distinct-key estimate over the UNION of all sketch rows — merge-only
    (no data rescan): e.g. 'unique documents across every epoch so far'."""
    return int(
        sketches.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(hll))")
        ).collect()[0][0]
    )


def overlap_estimates(sketches: DataFrame) -> DataFrame:
    """Pairwise overlap between groups from Theta sketches alone:
    ``(group_a, group_b, inter, union, jaccard, contain_a_in_b)`` for every
    unordered pair — the 'how much of crawl B have we already got from
    crawl A' question, answered in O(groups²) sketch ops instead of a
    distributed join of every pair of sources.  ``contain_a_in_b`` =
    |A∩B| / |A| (containment is the dedup-planning number: 0.9 means
    ingesting B's overlap with A is 90% wasted work)."""
    a, b = sketches.alias("a"), sketches.alias("b")
    inter = F.expr("theta_sketch_estimate(theta_intersection(a.theta, b.theta))")
    uni = F.expr("theta_sketch_estimate(theta_union(a.theta, b.theta))")
    est_a = F.expr("theta_sketch_estimate(a.theta)")
    return (
        a.join(b, F.col("a.group") < F.col("b.group"))
        .select(
            F.col("a.group").alias("group_a"),
            F.col("b.group").alias("group_b"),
            inter.alias("inter"),
            uni.alias("union"),
            (inter / F.greatest(uni, F.lit(1.0))).alias("jaccard"),
            (inter / F.greatest(est_a, F.lit(1.0))).alias("contain_a_in_b"),
        )
    )


# Driver-evidence configuration (the stats_summary op='sketch*' branches):
# keys are doc_id mod SKETCH_KEY_MOD so language groups OVERLAP (the Theta
# intersection has something to estimate); tolerances follow the
# approx_stats accuracy-contract pattern.
SKETCH_KEY_MOD = 50
SKETCH_REL_ERR = 0.05
SKETCH_Q_REL_ERR = 0.10  # KLL rank error maps to a wider value tolerance


def sketch_evidence_rows(spark, sf_dir):
    """Driver-hashable evidence for the WHOLE mergeable-sketch family —
    the ``approx_stats`` accuracy-contract pattern applied to
    :func:`group_sketches` / :func:`union_distinct` /
    :func:`overlap_estimates` / :func:`merged_quantiles`: every emitted
    column is either an EXACT value (re-derivable in SQL) or a boolean
    asserting the sketch estimate sits within tolerance of it, so a
    sketch drifting breaks the hash while the estimate itself (whose
    bits are library-version-specific) never enters it.

    Rows (grp, n, exact_parts, ok):
    - op='sketch' per language: the artifact's exact row counter and the
      HLL distinct-key estimate vs exact COUNT(DISTINCT doc_id % mod)
    - op='sketch_ov' per language pair: Theta intersection vs the exact
      overlap (keys shared across groups by construction)
    - op='sketch_u': merge-only union distinct vs the global exact
    - op='sketch_q': merged-KLL median of n_chars vs the exact discrete
      median (value at rank (n+1) div 2)

    Driver cost: two bounded scalars (union estimate, merged quantile) —
    both are merge-only sketch reads, the exact thing this module exists
    to make cheap."""
    from pyspark.sql.window import Window as W

    from ..sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.pmod(F.col("doc_id"), F.lit(SKETCH_KEY_MOD)).alias("k"),
        "n_chars",
    )
    sk = group_sketches(d, "lang", "k", "n_chars").localCheckpoint()
    exact = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("__rows"),
        F.countDistinct("k").alias("__nd"),
    )
    tol = lambda e: F.greatest(  # noqa: E731
        F.lit(SKETCH_REL_ERR) * e.cast("double"), F.lit(1.0)
    )
    hll_est = F.expr("hll_sketch_estimate(hll)").cast("double")
    per_group = sk.join(exact, sk["group"] == exact["lang"]).select(
        F.lit("sketch").alias("sop"),
        F.col("group").alias("grp"),
        F.col("rows").cast("bigint").alias("n"),
        F.col("__nd").cast("bigint").alias("exact_parts"),
        (F.abs(hll_est - F.col("__nd").cast("double")) <= tol(F.col("__nd")))
        .alias("ok"),
    )
    dk = d.select("lang", "k").distinct().localCheckpoint()
    ex_inter = (
        dk.alias("x")
        .join(
            dk.alias("y"),
            (F.col("y.k") == F.col("x.k"))
            & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(
            F.col("x.lang").alias("ga"), F.col("y.lang").alias("gb")
        )
        .agg(F.countDistinct("x.k").alias("__i"))
    )
    ov = overlap_estimates(sk)
    pair_rows = (
        ov.join(
            ex_inter,
            (ov["group_a"] == ex_inter["ga"]) & (ov["group_b"] == ex_inter["gb"]),
            "left",
        )
        .select(
            F.lit("sketch_ov").alias("sop"),
            F.concat("group_a", F.lit("|"), "group_b").alias("grp"),
            F.lit(None).cast("bigint").alias("n"),
            F.coalesce("__i", F.lit(0)).cast("bigint").alias("exact_parts"),
            (
                F.abs(F.col("inter") - F.coalesce("__i", F.lit(0)).cast("double"))
                <= tol(F.coalesce("__i", F.lit(0)))
            ).alias("ok"),
        )
    )
    # merge-only reads (bounded driver scalars) + their exact counterparts
    u_est = union_distinct(sk)
    exact_all = d.agg(F.countDistinct("k")).collect()[0][0]
    q50_est = merged_quantiles(sk, [0.5])[0]
    med_rows = (
        d.select(
            "n_chars",
            F.row_number().over(W.orderBy("n_chars")).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("cnt"),
        )
        .filter(F.expr("rn = (cnt + 1) div 2"))
        .collect()
    )
    exact_med = int(med_rows[0]["n_chars"])
    scalars = spark.createDataFrame(
        [
            (
                "sketch_u",
                "__union__",
                None,
                int(exact_all),
                bool(
                    abs(u_est - exact_all)
                    <= max(SKETCH_REL_ERR * exact_all, 1.0)
                ),
            ),
            (
                "sketch_q",
                "__all__",
                None,
                exact_med,
                bool(abs(q50_est - exact_med) <= SKETCH_Q_REL_ERR * exact_med),
            ),
        ],
        "sop string, grp string, n long, exact_parts long, ok boolean",
    )
    return per_group.unionByName(pair_rows).unionByName(scalars)


def merged_quantiles(sketches: DataFrame, probs) -> list:
    """Quantiles of the merged KLL sketch across all rows — e.g. the p50/p99
    document length over every epoch, from artifacts only.  The merge runs
    ONCE (one ``kll_merge_agg_double``), then each probability is a scalar
    query against the merged sketch."""
    merged = sketches.agg(F.expr("kll_merge_agg_double(kll)").alias("m"))
    row = merged.select(
        *[
            F.expr(
                f"kll_sketch_get_quantile_double(m, CAST({float(p)} AS DOUBLE))"
            ).alias(f"q{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    return [row[f"q{i}"] for i in range(len(probs))]
