"""Connected components vs a driver-side union-find oracle, and the dedup
tail (pairs → canonical survivors) on real MinHash pair output."""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.clustering import (
    connected_components,
    dedup_canonical,
)
from hive_serde_schema_gen_spark.operators.dedup import minhash_lsh_pairs
from hive_serde_schema_gen_spark.sources.tables import load_table


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per node, matching the operator's contract
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    want = set(_union_find(edges).items())
    # both execution paths must agree with the oracle: the driver-side
    # union-find fallback (default for small graphs) AND the distributed
    # label-propagation loop (small_graph_threshold=0 forces it)
    for threshold in (None, 0):
        kwargs = {} if threshold is None else {"small_graph_threshold": 0}
        got = {
            (r.id, r.component)
            for r in connected_components(df, **kwargs).collect()
        }
        assert got == want, f"threshold={threshold}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(40)
        # self-loops included on purpose: the operator must ignore them
    ]
    _check(spark, edges)


def test_chain_converges_logarithmically(spark):
    # a 64-node path is the worst case for pure propagation (63 rounds);
    # pointer jumping must close it well inside max_iter=10
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.id, r.component)
        for r in connected_components(
            df, max_iter=10, small_graph_threshold=0  # force distributed
        ).collect()
    }
    assert got == {(i, 0) for i in range(64)}


def test_two_components_and_duplicate_edges(spark):
    edges = [(5, 3), (3, 5), (3, 9), (20, 21), (21, 20), (21, 21)]
    _check(spark, edges)


def test_dedup_canonical_on_minhash_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    out = dedup_canonical(docs, pairs).cache()
    edge_list = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    comp_of = _union_find(edge_list)
    clusters = {}
    for node, root in comp_of.items():
        clusters.setdefault(root, set()).add(node)
    survivors = {r.doc_id: r.n_merged for r in out.select("doc_id", "n_merged").collect()}
    n_docs = docs.count()
    # every cluster keeps exactly its min id, absorbing the rest
    for root, members in clusters.items():
        assert survivors[min(members)] == len(members) - 1
        for m in members - {min(members)}:
            assert m not in survivors
    # unpaired docs all survive untouched
    assert len(survivors) == n_docs - sum(len(m) - 1 for m in clusters.values())
    assert out.filter(F.col("n_merged") == 0).count() == len(survivors) - len(clusters)
    out.unpersist()


def test_dedup_canonical_query_matches_recursive_cte_oracle(spark, sf_dir_oracle):
    """The standalone dedup-tail query (registry slot ceded to
    corpus_pipeline in round 3) keeps its exact recursive-CTE oracle here."""
    import duckdb

    from hive_serde_schema_gen_spark.operators.clustering import (
        _canonical_oracle,
        dedup_canonical_query,
    )

    got = sorted(
        (r["doc_id"], r["n_merged"])
        for r in dedup_canonical_query(spark, sf_dir_oracle).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir_oracle}/documents.parquet'"
    )
    want = sorted((r[0], r[1]) for r in con.execute(_canonical_oracle()).fetchall())
    con.close()
    assert got == want


def test_union_prune_base_rows_equal_base_prune(spark):
    """Round-18 sharing: the corpus∪batch evidence prune filtered to
    base ids must equal semdedup_prune over the base alone — the
    invariant that lets curation_ops feed one pair stage into both the
    op='semdedup' evidence and the persisted-index build (batch ids all
    carry >= SD_EXACT_OFF offsets; dup attribution only looks at
    smaller ids)."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        KM_ITERS,
        KM_K,
        SD_EXACT_OFF,
        SD_THRESHOLD,
        kmeans_topics,
        semdedup_evidence_frame,
        semdedup_prune,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    e = load_table(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_topics(e, k=KM_K, iters=KM_ITERS)
    assigned = assigned.localCheckpoint()
    union_rows = (
        semdedup_evidence_frame(spark, sf_dir, cents, assigned)
        .filter(F.col("vec_id") < SD_EXACT_OFF)
        .collect()
    )
    direct_rows = semdedup_prune(
        e, assigned, threshold=SD_THRESHOLD
    ).collect()
    assert sorted(map(tuple, union_rows)) == sorted(
        map(tuple, direct_rows)
    )


def test_split_evidence_frame_equals_union_prune(spark):
    """Round-18 sharing, second half: semdedup_evidence_frame with
    base_pruned= (base rows from the caller, batch rows from the
    restricted pair stage) must be row-identical to the unrestricted
    corpus∪batch prune."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        KM_ITERS,
        KM_K,
        SD_THRESHOLD,
        kmeans_topics,
        semdedup_evidence_frame,
        semdedup_prune,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    e = load_table(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_topics(e, k=KM_K, iters=KM_ITERS)
    assigned = assigned.localCheckpoint()
    whole = semdedup_evidence_frame(spark, sf_dir, cents, assigned)
    base_pruned = semdedup_prune(
        e, assigned, threshold=SD_THRESHOLD
    ).localCheckpoint()
    split = semdedup_evidence_frame(
        spark, sf_dir, cents, assigned, base_pruned=base_pruned
    )
    assert sorted(map(tuple, split.collect())) == sorted(
        map(tuple, whole.collect())
    )
