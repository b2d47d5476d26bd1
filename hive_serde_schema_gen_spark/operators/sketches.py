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
