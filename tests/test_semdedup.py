"""SemDeDup-style embedding-cluster dedup (`clustering.semdedup_prune` +
`assign_to_centroids` + `semdedup_novel`): keep-first pair rule, zero-vector
handling, frozen-centroid assignment stability, and the planted-evidence
construction (`semdedup_evidence_frame`) at sf0.001."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.clustering import (
    SD_EXACT_MOD,
    SD_EXACT_OFF,
    SD_EXACT_REM,
    SD_NOVEL_OFF,
    SD_THRESHOLD,
    assign_to_centroids,
    kmeans_topics,
    semdedup_evidence_frame,
    semdedup_novel,
    semdedup_prune,
)


def _edf(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def clustered(spark):
    """Two well-separated directions; ids 0/1 seed the two cells."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0
        (3, [1.0, 0.0, 0.0, 0.0]),     # exact dup of 0
        (4, [0.0, 0.0, 0.9, 0.1]),     # same cell as 1, below threshold? cos=0.9938
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector
        (6, [0.0, 1.0, 0.0, 0.0]),     # orthogonal to everything else
    ]
    e = _edf(spark, rows)
    cents, assigned = kmeans_topics(e, k=2, iters=1)
    return e, cents, assigned


def test_pair_rule_and_attribution(spark, clustered):
    e, _, assigned = clustered
    out = {
        r["vec_id"]: r
        for r in semdedup_prune(e, assigned, threshold=0.999).collect()
    }
    assert len(out) == 7
    # exact dup of 0 drops, attributed to the SMALLEST near-dup id (0)
    assert out[3]["dup_of"] == 0
    assert out[3]["dup_cos"] == pytest.approx(1.0, abs=1e-12)
    # near-dup 2 (cos ~0.9999995) also drops to 0 at threshold .999
    assert out[2]["dup_of"] == 0
    # the sources and everything below threshold stay kept
    for vid in (0, 1, 4, 6):
        assert out[vid]["dup_of"] is None, vid
    # zero vector: no cosine exists — always kept
    assert out[5]["dup_of"] is None


def test_zero_vectors_never_pair_even_together(spark):
    e = _edf(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),
            (2, [0.0, 0.0]),  # second zero vector, same cell as 1
        ],
    )
    cents, assigned = kmeans_topics(e, k=1, iters=1)
    out = semdedup_prune(e, assigned, threshold=0.5).collect()
    assert all(r["dup_of"] is None for r in out if r["vec_id"] in (1, 2))


def test_semdedup_novel_antijoin(spark, clustered):
    e, _, assigned = clustered
    pruned = semdedup_prune(e, assigned, threshold=0.999)
    kept = sorted(
        r["vec_id"] for r in semdedup_novel(e, pruned).collect()
    )
    assert kept == [0, 1, 4, 5, 6]


def test_frozen_assignment_matches_training(spark, clustered):
    """Re-assigning the training vectors against the frozen centroids
    reproduces the training assignment exactly (same metric, same
    tie-break) — the invariant the incremental path depends on."""
    e, cents, assigned = clustered
    train = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    frozen = {
        r["vec_id"]: r["cluster"]
        for r in assign_to_centroids(e, cents).collect()
    }
    assert frozen == train


def test_evidence_frame_families(spark, sf_dir):
    """The planted-batch expectations the slot hash pins, at sf0.001:
    every exact copy drops with dup_of = its source; reversed vectors
    and the whole base corpus stay kept."""
    e_count = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    cents_assigned = kmeans_topics(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=8, iters=2
    )
    out = semdedup_evidence_frame(
        spark, sf_dir, cents_assigned[0], cents_assigned[1]
    ).collect()
    rows = {r["vec_id"]: r for r in out}
    exacts = [
        v for v in rows if SD_EXACT_OFF <= v < 2 * SD_EXACT_OFF
    ]
    assert exacts, "no exact plants at this SF?"
    for v in exacts:
        src = v - SD_EXACT_OFF
        assert rows[v]["dup_of"] == src, v
        assert src % SD_EXACT_MOD == SD_EXACT_REM
        assert rows[v]["dup_cos"] >= SD_THRESHOLD
    for v in rows:
        if v < SD_EXACT_OFF:  # base corpus
            assert rows[v]["dup_of"] is None, v
        if v >= SD_NOVEL_OFF:  # reversed vectors are new content
            assert rows[v]["dup_of"] is None, v
    assert len(rows) == e_count + len(exacts) + sum(
        1 for v in rows if 2 * SD_EXACT_OFF <= v < SD_NOVEL_OFF
    ) + sum(1 for v in rows if v >= SD_NOVEL_OFF)


# ---------------------------------------------------------------------------
# Persisted SemDeDup index lifecycle (round 12)
# ---------------------------------------------------------------------------


def _cluster_corpus(spark):
    """Two topic half-spaces, three well-separated angles each (adjacent
    cosines <= 0.71) — the whole corpus survives the build-time prune at
    threshold 0.99."""
    return _edf(
        spark,
        [
            (0, [10.0, 0.0, 0.0, 0.0]),
            (1, [7.0, 7.0, 0.0, 0.0]),
            (2, [0.0, 10.0, 0.0, 0.0]),
            (10, [0.0, 0.0, 10.0, 0.0]),
            (11, [0.0, 0.0, 7.0, 7.0]),
            (12, [0.0, 0.0, 0.0, 10.0]),
        ],
    )


@pytest.fixture(scope="module")
def sd_index(spark, tmp_path_factory):
    from hive_serde_schema_gen_spark.operators.clustering import (
        persist_semdedup_index,
    )

    e = _cluster_corpus(spark)
    path = str(tmp_path_factory.mktemp("sdidx") / "semdedup_index")
    persist_semdedup_index(e, path, k=2, iters=1, threshold=0.99)
    return e, path


def test_probe_finds_near_dups_and_novel(spark, sd_index):
    from hive_serde_schema_gen_spark.operators.clustering import (
        semdedup_against_index,
        semdedup_novel,
    )

    e, path = sd_index
    batch = _edf(
        spark,
        [
            (100, [10.0, 0.0, 0.0, 0.0]),    # exact dup of vec 0
            (101, [0.0, 0.0, 10.0, 0.5]),    # near-dup of vec 10 (cos .9988)
            (102, [5.0, 0.0, 5.0, 0.0]),     # novel cross-topic direction
        ],
    )
    hits = semdedup_against_index(batch, path)
    got = {
        r["vec_id"]: r["matched_vec_id"]
        for r in hits.orderBy("vec_id", "matched_vec_id").collect()
    }
    assert got[100] == 0
    assert got[101] == 10
    assert 102 not in got
    novel = sorted(
        r["vec_id"] for r in semdedup_novel(batch, hits.withColumnRenamed(
            "matched_vec_id", "dup_of")).collect()
    )
    assert novel == [102]


def test_probe_prunes_member_partitions(spark, sd_index):
    """The members scan must carry a cluster partition filter — the probe
    reads the batch's clusters, not the index."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        semdedup_against_index,
    )
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    _, path = sd_index
    batch = _edf(spark, [(200, [10.0, 1.0, 0.0, 0.0])])  # one cluster
    plan = explain_str(semdedup_against_index(batch, path))
    assert "PartitionFilters" in plan
    # the filter must reference the cluster partition column
    line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "cluster" in line


def test_extend_under_frozen_centroids(spark, sd_index, tmp_path):
    from hive_serde_schema_gen_spark.operators.clustering import (
        extend_semdedup_index,
        persist_semdedup_index,
        semdedup_against_index,
    )

    e = _cluster_corpus(spark)
    path = str(tmp_path / "sd-extend")
    persist_semdedup_index(e, path, k=2, iters=1, threshold=0.99)
    probe = _edf(spark, [(300, [5.0, 0.0, 5.0, 0.0])])
    assert semdedup_against_index(probe, path).count() == 0  # novel
    extend_semdedup_index(probe, path)
    again = semdedup_against_index(
        _edf(spark, [(301, [5.0, 0.0, 5.0, 0.0])]), path
    ).collect()
    assert [(r["vec_id"], r["matched_vec_id"]) for r in again] == [(301, 300)]


def test_build_indexes_survivors_only(spark, tmp_path):
    """A corpus containing its own near-dups persists only canonicals."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        persist_semdedup_index,
    )

    e = _edf(
        spark,
        [
            (0, [10.0, 1.0, 0.0, 0.0]),
            (1, [10.0, 1.0, 0.0, 0.0]),   # exact dup of 0 — pruned
            (2, [0.0, 0.0, 10.0, 1.0]),
        ],
    )
    path = str(tmp_path / "sd-surv")
    persist_semdedup_index(e, path, k=2, iters=1, threshold=0.99)
    members = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/members").collect()
    )
    assert members == [0, 2]


def test_meta_version_mismatch_errors(spark, sd_index, monkeypatch):
    from hive_serde_schema_gen_spark.operators import clustering as C

    _, path = sd_index
    monkeypatch.setattr(C, "SEMDEDUP_INDEX_VERSION", 99)
    with pytest.raises(ValueError, match="version"):
        C.semdedup_against_index(
            _edf(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), path
        )


# ---------------------------------------------------------------------------
# Invariants (property-style)
# ---------------------------------------------------------------------------


def test_prune_is_total_and_attributes_downward(spark, clustered):
    """One output row per input vector; every dup_of is a SMALLER id in
    the SAME cluster; dup_cos >= threshold."""
    e, _, assigned = clustered
    t = 0.99
    out = semdedup_prune(e, assigned, threshold=t).collect()
    assert len(out) == e.count()
    clusters = {r["vec_id"]: r["cluster"] for r in out}
    for r in out:
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]
            assert clusters[r["dup_of"]] == r["cluster"]
            assert r["dup_cos"] >= t


def test_prune_is_idempotent_on_survivors(spark, clustered):
    """Pruning the kept set again (same assignments) drops nothing — the
    fixed point every dedup operator must reach in one pass under the
    pair rule... UNLESS a dropped middle element was the only bridge;
    the pair rule has no such bridges: survivors were pairwise below
    threshold already."""
    e, _, assigned = clustered
    pruned = semdedup_prune(e, assigned, threshold=0.999)
    kept_ids = pruned.filter(F.col("dup_of").isNull()).select("vec_id")
    kept_e = e.join(kept_ids, "vec_id")
    again = semdedup_prune(kept_e, assigned, threshold=0.999).collect()
    assert all(r["dup_of"] is None for r in again)


def test_prune_threshold_monotonicity(spark, clustered):
    """Lowering the threshold can only drop MORE vectors, never fewer."""
    e, _, assigned = clustered
    dropped_hi = {
        r["vec_id"]
        for r in semdedup_prune(e, assigned, threshold=0.9999).collect()
        if r["dup_of"] is not None
    }
    dropped_lo = {
        r["vec_id"]
        for r in semdedup_prune(e, assigned, threshold=0.99).collect()
        if r["dup_of"] is not None
    }
    assert dropped_hi <= dropped_lo


def test_max_cell_guard(spark, clustered):
    """The skew guard raises with offending cell sizes instead of
    launching a quadratic pair stage; a generous bound passes through;
    None is the explicit opt-out."""
    e, _, assigned = clustered
    with pytest.raises(ValueError, match="cell-size guard"):
        semdedup_prune(e, assigned, threshold=0.999, max_cell=2)
    out = semdedup_prune(e, assigned, threshold=0.999, max_cell=100)
    assert out.count() == e.count()
    assert (
        semdedup_prune(e, assigned, threshold=0.999, max_cell=None).count()
        == e.count()
    )


def test_max_cell_guard_default_on_catches_giant_cell(spark):
    """Round 13: the guard is DEFAULT-ON with a derived bound — a planted
    mega-cluster (one cell holding ~all of a >1000-vector corpus, the
    shape a dedup corpus of near-identical docs produces) raises without
    any caller opt-in, while a balanced clustering of the same size
    passes untouched."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        SD_GUARD_MIN_CELL,
    )

    n = SD_GUARD_MIN_CELL + 400
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 97).cast("float"), F.lit(1.0).cast("float")
        ).alias("embedding"),
    )
    giant = spark.range(n).select(
        F.col("id").alias("vec_id"),
        # 16 clusters exist, but cluster 0 holds all but 15 vectors:
        # bound = max(1000, 8·n/16) < |cell 0|
        F.when(F.col("id") < 15, F.col("id") + 1)
        .otherwise(F.lit(0))
        .cast("int")
        .alias("cluster"),
    )
    with pytest.raises(ValueError, match="cell-size guard"):
        semdedup_prune(e, giant, threshold=0.999).count()
    balanced = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 16).cast("int").alias("cluster"),
    )
    assert semdedup_prune(e, balanced, threshold=0.9999).count() == n


def test_materialize_skips_window_definitions():
    """Round 13: ``WINDOW w AS (...)`` (and multi-window clauses) share
    the ``name AS (`` shape with CTE definitions but cannot be
    MATERIALIZED — the rewrite must leave every window name alone while
    still materializing real CTEs around it."""
    from hive_serde_schema_gen_spark.operators.clustering import _materialize

    sql = (
        "rep AS (SELECT a, b FROM t),\n"
        "win AS (\n"
        "  SELECT a, SUM(b) OVER w AS s1, COUNT(b) OVER (w) AS n\n"
        "  FROM rep\n"
        "  WINDOW w AS (PARTITION BY a ORDER BY b\n"
        "               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),\n"
        "base AS (SELECT * FROM win WHERE n > 5)"
    )
    out = _materialize(sql)
    assert "rep AS MATERIALIZED (" in out
    assert "win AS MATERIALIZED (" in out
    assert "base AS MATERIALIZED (" in out
    assert "WINDOW w AS (PARTITION" in out  # untouched
    assert "w AS MATERIALIZED" not in out
    # multi-window clause: both names skipped, trailing CTE still marked
    multi = (
        "c1 AS (SELECT * FROM t),\n"
        "c2 AS (SELECT SUM(x) OVER w AS s, AVG(x) OVER v AS m FROM c1\n"
        "  WINDOW w AS (PARTITION BY k), v AS (ORDER BY x)),\n"
        "c3 AS (SELECT * FROM c2)"
    )
    mout = _materialize(multi)
    assert "c1 AS MATERIALIZED (" in mout
    assert "c2 AS MATERIALIZED (" in mout
    assert "c3 AS MATERIALIZED (" in mout
    assert "w AS (PARTITION BY k), v AS (ORDER BY x)" in mout


def test_semdedup_ingest_composes_with_batch_self_dedup(spark, tmp_path):
    """Round 13 (README/API contract): the composed ingest self-dedups
    the batch before extending — intra-batch near-duplicates enter the
    index ONCE, index matches never enter, genuinely-new content does."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        persist_semdedup_index,
        semdedup_against_index,
        semdedup_ingest,
    )

    e = _cluster_corpus(spark)
    path = str(tmp_path / "sd-ingest")
    persist_semdedup_index(e, path, k=2, iters=1, threshold=0.99)
    batch = _edf(
        spark,
        [
            (400, [10.0, 0.0, 0.0, 0.0]),   # dup of indexed vec 0 — rejected
            (401, [5.0, 0.0, 5.0, 0.0]),    # novel direction, kept
            (402, [5.0, 0.0, 5.0, 0.001]),  # intra-batch dup of 401 — pruned
            (403, [0.0, 5.0, 0.0, 5.0]),    # second novel direction, kept
        ],
    )
    novel, report = semdedup_ingest(batch, path)
    assert report == {"n_batch": 4, "n_novel": 2}
    assert sorted(r["vec_id"] for r in novel.collect()) == [401, 403]
    members = sorted(
        r["vec_id"] for r in spark.read.parquet(f"{path}/members").collect()
    )
    assert members == [0, 1, 2, 10, 11, 12, 401, 403]
    # a re-crawl of the pruned intra-batch dup now matches the index
    rehit = semdedup_against_index(
        _edf(spark, [(500, [5.0, 0.0, 5.0, 0.001])]), path
    ).collect()
    assert [r["matched_vec_id"] for r in rehit] == [401]


def test_compact_semdedup_index(spark, tmp_path):
    """Round 13: compaction folds extend-epochs (including a replayed
    extend's duplicate rows) into one clustered generation — probe
    results identical pre/post, HIVE cluster partitioning (and its
    PartitionFilters pruning) preserved, duplicate member rows gone."""
    import glob

    from hive_serde_schema_gen_spark.operators.clustering import (
        compact_semdedup_index,
        extend_semdedup_index,
        persist_semdedup_index,
        semdedup_against_index,
    )
    from hive_serde_schema_gen_spark.plans.explain import explain_str

    e = _cluster_corpus(spark)
    path = str(tmp_path / "sd-compact")
    persist_semdedup_index(e, path, k=2, iters=1, threshold=0.99)
    b1 = _edf(spark, [(300, [5.0, 0.0, 5.0, 0.0])])
    b2 = _edf(spark, [(301, [0.0, 5.0, 0.0, 5.0])])
    extend_semdedup_index(b1, path)
    extend_semdedup_index(b1, path)  # crash-replay of the same epoch
    extend_semdedup_index(b2, path)
    probe = _edf(
        spark,
        [
            (400, [10.0, 0.0, 0.0, 0.0]),
            (401, [5.0, 0.0, 5.0, 0.001]),
            (402, [0.0, 5.0, 0.0, 5.0]),
        ],
    )
    before = sorted(
        map(tuple, semdedup_against_index(probe, path).collect())
    )
    files_before = len(glob.glob(f"{path}/members/cluster=*/*.parquet"))
    compact_semdedup_index(spark, path)
    after = sorted(
        map(tuple, semdedup_against_index(probe, path).collect())
    )
    # set-parity: the replayed extend makes the PRE-compaction probe
    # emit its (401, 300) hit twice — folding that duplicate is part of
    # what compaction is for; no hit appears or disappears
    assert set(after) == set(before) and after
    assert len(after) == len(set(after))  # post: no duplicate hits
    assert len(before) == len(after) + 1  # pre: exactly the replay dup
    files_after = len(glob.glob(f"{path}/members/cluster=*/*.parquet"))
    assert files_after < files_before
    m = spark.read.parquet(f"{path}/members")
    assert m.count() == m.distinct().count()  # replay rows folded
    assert m.filter(F.col("vec_id") == 300).count() == 1
    # partition pruning still works on the compacted layout
    plan = explain_str(
        semdedup_against_index(
            _edf(spark, [(500, [10.0, 1.0, 0.0, 0.0])]), path
        )
    )
    line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "cluster" in line
