"""PageRank: exact agreement with a numpy power-iteration oracle on small
graphs, dangling-mass conservation, convergence, and early stop."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.operators.graph import pagerank


def _oracle(edges, iters, damping=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = sum(r[idx[v]] for v in nodes if deg[v] == 0)
        for s, d in edges:
            nxt[idx[d]] += r[idx[s]] / deg[s]
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # simple chain with a dangling sink
        [("a", "b"), ("b", "c"), ("a", "c")],
        # cycle + hub with multi-edge
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "b")],
    ],
)
def test_pagerank_matches_oracle(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    want = _oracle(edges, iters=8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)  # mass conserved


def test_pagerank_authority_ordering(spark):
    # everyone links to 'hub'; hub links to one spoke — hub must dominate
    edges = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=15).collect()}
    assert got["hub"] == max(got.values())
    assert got["s1"] > got["s2"] == pytest.approx(got["s3"])


def test_pagerank_early_stop(spark):
    edges = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    # symmetric 2-cycle converges immediately; tol stops it and the result
    # is the fixed point
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=50, tol=1e-9).collect()}
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iters=3).collect() == []


def test_domain_pagerank_on_url_docs(spark):
    from hive_serde_schema_gen_spark.operators.graph import domain_pagerank

    docs = [
        (1, "see https://hub.com/x and https://a.org/y plus https://b.net/z"),
        (2, "refs https://hub.com/q and https://b.net/w"),
        (3, "only https://a.org/k here with https://hub.com/v"),
        (4, "no urls at all"),
    ]
    d = spark.createDataFrame(docs, "doc_id int, text string")
    ranks = {r["node"]: r["rank"] for r in domain_pagerank(d, iters=8).collect()}
    # edges point first-mentioned -> later-mentioned: doc1 gives hub->a,
    # hub->b, a->b; doc2 hub->b; doc3 a->hub.  b.net is cited latest
    # everywhere it appears, so it RECEIVES the most mass
    assert set(ranks) == {"hub.com", "a.org", "b.net"}
    assert ranks["b.net"] == max(ranks.values())
    assert sum(ranks.values()) == pytest.approx(1.0)


def test_domain_pagerank_repeated_mentions_count_once(spark):
    """A doc spamming one domain many times must not SKEW how the source's
    rank mass splits among co-mentioned domains.  (Parallel edges to a
    single target are self-normalizing; the occurrence-product bug showed
    up as an uneven split: 10 mentions of v1 vs 1 of v2 gave v1 100/110 of
    the mass instead of 1/2.)"""
    from hive_serde_schema_gen_spark.operators.graph import domain_pagerank

    spam = (
        " ".join("https://aaa-spam.com/x https://v1.org/y" for _ in range(10))
        + " https://v2.org/z"
    )
    clean = "https://aaa-spam.com/x https://v1.org/y https://v2.org/z"
    for_spam = spark.createDataFrame([(1, spam)], "doc_id int, text string")
    for_clean = spark.createDataFrame([(1, clean)], "doc_id int, text string")
    r_spam = {r["node"]: r["rank"] for r in domain_pagerank(for_spam, iters=8).collect()}
    r_clean = {r["node"]: r["rank"] for r in domain_pagerank(for_clean, iters=8).collect()}
    # repetition invariance: 10× mentions rank identically to 1× mentions
    assert set(r_spam) == set(r_clean)
    for k in r_clean:
        assert r_spam[k] == pytest.approx(r_clean[k], abs=1e-12)


def test_pagerank_job_count_per_iteration(spark):
    """Round-8 regression guard for the dangling-mass fold: each
    iteration costs exactly TWO Spark jobs — the broadcast of the 1-row
    dangling aggregate (Spark executes broadcast exchanges as their own
    job) and the rank localCheckpoint.  The pre-fix driver collect()
    added a third blocking round-trip per iteration.  Measured with AQE
    OFF: under AQE every materialized shuffle stage is reported as its
    own job (measured 12 "jobs"/iter for the same work), so raw job
    counts only reflect plan structure without it.  Setup jobs are
    excluded by differencing two iteration counts."""
    from hive_serde_schema_gen_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3) % 40) for i in range(200)], "src long, dst long"
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(iters, group):
        sc.setJobGroup(group, group)
        try:
            pagerank(edges, iters=iters).count()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j2 = jobs_for(2, "pr-iters2")
        j6 = jobs_for(6, "pr-iters6")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    per_iter = (j6 - j2) / 4.0
    assert per_iter <= 2.0, (j2, j6, per_iter)


def test_pagerank_tol_job_count_matches_fixed_iterations(spark):
    """Round-9: the L1-delta early-stop is folded into the job that
    materializes the per-iteration checkpoint (lazy localCheckpoint +
    the delta aggregate as its action), so setting ``tol`` adds ZERO
    jobs per iteration — the pre-fix form ran a driver collect() per
    iteration on top.  tol is set unreachably small so both runs do the
    same number of iterations."""
    from hive_serde_schema_gen_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7) % 30) for i in range(150)], "src long, dst long"
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(group, **kw):
        sc.setJobGroup(group, group)
        try:
            pagerank(edges, **kw).count()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j2 = jobs_for("prtol-i2", iters=2, tol=0.0)
        j6 = jobs_for("prtol-i6", iters=6, tol=0.0)
        f2 = jobs_for("prfix-i2", iters=2)
        f6 = jobs_for("prfix-i6", iters=6)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert (j6 - j2) == (f6 - f2), (j2, j6, f2, f6)


def test_pagerank_tol_early_stop_result_matches_fixed(spark):
    """With tol folded into the rebuild, converged ranks must equal the
    fixed-iteration result (the 2-cycle converges in one step)."""
    from hive_serde_schema_gen_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=50, tol=1e-9).collect()}
    want = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    assert got == pytest.approx(want)
