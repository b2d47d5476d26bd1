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

from ..registry import query


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
    drops below it.  FREE: the previous rank rides the rebuild and the
    delta aggregate doubles as the action that materializes the lazy
    per-iteration checkpoint, so the per-iteration job count equals the
    fixed-iteration path (same fold discipline as the dangling mass —
    the pre-fix form ran a separate driver collect() per iteration)."""
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
        # Dangling mass folds into the SAME job as the rank rebuild: the
        # 1-row aggregate joins in via a broadcast cross join (a broadcast
        # exchange stage of the one job), instead of a driver collect()
        # that forced a second job per iteration.
        dangling_row = (
            ranks.join(out_deg, "node", "left")
            .filter(F.col("__deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
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
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("__dangling") / n
            + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
        ).alias("rank")
        built = nodes.join(contribs, "node", "left").crossJoin(
            F.broadcast(dangling_row)
        )
        if tol is None:
            # cut per iteration — no 2^k DAG
            ranks = built.select("node", new_rank).localCheckpoint()
        else:
            # The delta is folded into the SAME job that materializes the
            # per-iteration checkpoint: prev's rank rides the rebuild
            # (one more co-partitioned join on the node key), the
            # checkpoint is LAZY, and the L1 aggregate is the action that
            # realizes it — job count identical to the fixed-iteration
            # path, where the old form collect()ed a second job.
            with_prev = (
                built.join(
                    prev.select("node", F.col("rank").alias("__p")), "node"
                )
                .select("node", new_rank, "__p")
                .localCheckpoint(eager=False)
            )
            delta = with_prev.agg(
                F.sum(F.abs(F.col("rank") - F.col("__p")))
            ).collect()[0][0]
            ranks = with_prev.select("node", "rank")
            if delta < tol:
                break
    return ranks


def domain_pagerank(
    d: DataFrame, iters: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PageRank over the document→domain citation graph: an edge from the
    document's OWN source domain is unknowable here, so the graph is
    (citing doc's domains) — each pair of domains co-mentioned in one
    document contributes a link from the FIRST-mentioned to the later
    (mention order by text position, a pragmatic proxy citation graph;
    with real crawl metadata, feed (page_domain, linked_domain) edges to
    :func:`pagerank` directly)."""
    from .curation import extract_urls

    # min occurrence position per (doc, domain): one doc mentioning a pair
    # of domains 10× each must contribute ONE co-mention link, not a
    # 100-weight multi-edge — repeated mentions are exactly the link-spam
    # pattern this rank exists to resist.  extract_urls is THE single
    # URL→domain canonicalization (a local copy would silently drift).
    u = (
        extract_urls(d, id_col, text_col, with_pos=True)
        .groupBy(id_col, "domain")
        .agg(F.min("pos").alias("pos"))
    )
    a, b = u.alias("a"), u.alias("b")
    edges = (
        a.join(b, F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
        # min positions per domain within a doc are distinct occurrence
        # indexes, so < is a total order — no tie branch needed
        .filter(F.col("a.pos") < F.col("b.pos"))
        .select(F.col("a.domain").alias("src"), F.col("b.domain").alias("dst"))
    )
    return pagerank(edges, iters=iters)


# ---------------------------------------------------------------------------
# Round-8 driver-oracle slot
# ---------------------------------------------------------------------------

PR_ITERS = 8
PR_DAMPING = 0.85


def _pagerank_oracle(iters: int = PR_ITERS, d: float = PR_DAMPING) -> str:
    """Unrolled fixed-iteration PageRank in pure SQL (DuckDB disallows
    aggregates in recursive CTEs, and unrolling keeps every float op in
    the same order as the Spark side: base, dangling, and contrib terms
    add left-to-right exactly like ``pagerank``'s rank expression)."""
    parts = [
        """edges AS MATERIALIZED (
      SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem),
    nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS dm
             FROM r{i - 1} r LEFT JOIN deg ON deg.node = r.node
             WHERE deg.node IS NULL),
    c{i} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / deg.deg) AS contrib
             FROM edges e JOIN r{i - 1} r ON r.node = e.src
             JOIN deg ON deg.node = e.src GROUP BY e.dst),
    r{i} AS MATERIALIZED (SELECT n.node,
                    (1.0 - {d}) / nn.n + {d} * d{i}.dm / nn.n
                    + {d} * COALESCE(c.contrib, 0.0) AS rank
             FROM nodes n LEFT JOIN c{i} c ON c.node = n.node, nn, d{i})"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"\n    SELECT node, round(rank, 9) AS rank FROM r{iters} ORDER BY node"
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """Driver slot for :func:`pagerank` (round-7 join-based power
    iteration): 8 fixed iterations over the lineitem supplier->part
    bipartite multigraph — every part node is DANGLING, so the
    dangling-mass redistribution term is exercised on most of the mass,
    and parallel (supplier, part) edges exercise multi-edge weighting.
    The oracle unrolls the same 8 iterations in SQL with every float op
    in the same order; the only cross-engine nondeterminism is contrib
    SUM association (ULP-level), so both sides round to 9 dp — nine
    orders above the compounded drift."""
    from ..sources.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    edges = l.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return (
        pagerank(edges, iters=PR_ITERS, damping=PR_DAMPING)
        .select("node", F.round("rank", 9).alias("rank"))
        .orderBy("node")
    )
