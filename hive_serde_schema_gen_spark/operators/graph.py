"""Graph operators over edge lists — PageRank (power iteration), the
domain-authority / link-spam signal of web-corpus curation, joining the
connected-components pass in ``clustering.py`` as the second graph op.

Shape: the classic Spark formulation — ranks and out-degrees are keyed
DataFrames, one hash-shuffle join per iteration contributes
``rank/out_degree`` along each edge, a map-side-combined sum re-forms the
rank vector, and damping + the dangling-mass redistribution are scalar
arithmetic.  Per-iteration lineage is CUT (localCheckpoint): an iterative
chain of joins otherwise doubles the DAG per step — the same 2^k lesson
``corpus.curate_and_prepare`` encodes.  At 100 TB the edges side is the
big stable relation (re-partitioned once on src and reused every
iteration); ranks are O(nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """Ranks for every node appearing in ``edges`` (as source OR target):
    ``(node, rank)``, ranks summing to 1.  Power iteration with uniform
    teleport; DANGLING nodes (no out-edges) redistribute their mass
    uniformly — without that term rank leaks and sums drift below 1.
    Parallel edges are treated as multi-edges (weight = multiplicity);
    pre-``distinct`` the frame if simple-graph semantics are wanted.

    ``tol``: optional early stop when the L1 delta between iterations
    drops below it (costs one extra aggregate per iteration)."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        edges.groupBy(F.col(src_col).alias("node"))
        .agg(F.count(F.lit(1)).alias("__deg"))
        .localCheckpoint()  # O(nodes); uncut, every iteration's dangling
        # join would re-run the full edges scan + groupBy
    )
    # stable big relation, partitioned once on the join key and reused
    contrib_edges = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("__dst"))
        .join(out_deg, "node")
        .repartition("node")
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        prev = ranks
        with_deg = ranks.join(out_deg, "node", "left")
        dangling = (
            with_deg.filter(F.col("__deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            contrib_edges.join(ranks, "node")
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # cut per iteration — no 2^k DAG
        )
        if tol is not None:
            delta = (
                ranks.join(prev.withColumnRenamed("rank", "__p"), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__p"))))
                .collect()[0][0]
            )
            if delta < tol:
                break
    return ranks


def domain_pagerank(
    d: DataFrame, iters: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PageRank over the document→domain citation graph: an edge from the
    document's OWN source domain is unknowable here, so the graph is
    (citing doc's domains) — each pair of domains co-mentioned in one
    document contributes a link from the earlier-mentioned to the later
    (a pragmatic proxy citation graph; with real crawl metadata, feed
    (page_domain, linked_domain) edges to :func:`pagerank` directly)."""
    from .curation import extract_urls

    # distinct per (doc, domain): one doc mentioning a pair of domains
    # 10× each must contribute ONE co-mention link, not a 100-weight
    # multi-edge — repeated mentions are exactly the link-spam pattern
    # this rank exists to resist
    u = extract_urls(d, id_col, text_col).select(id_col, "domain").distinct()
    a, b = u.alias("a"), u.alias("b")
    edges = (
        a.join(b, F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
        .filter(F.col("a.domain") < F.col("b.domain"))
        .select(F.col("a.domain").alias("src"), F.col("b.domain").alias("dst"))
    )
    return pagerank(edges, iters=iters)
