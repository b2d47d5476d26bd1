"""Persisted cell-partitioned IVF index: probe parity with the in-memory
path, and PHYSICAL partition-pruning evidence — the probe's plan carries
the probed cells as PartitionFilters, so only N_PROBE/N_CENTROIDS of the
artifact's directories are scanned."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.similarity import (
    N_CENTROIDS,
    N_PROBE,
    ann_topk_ivf,
    ann_topk_ivf_persisted,
    persist_ivf_index,
)
from hive_serde_schema_gen_spark.plans.explain import explain_str
from hive_serde_schema_gen_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path_factory.mktemp("ivf-idx"))
    persist_ivf_index(e, path)
    return path


def test_persisted_probe_matches_in_memory(spark, sf_dir, index_path):
    e = load_table(spark, sf_dir, "embeddings")
    mem = [tuple(r) for r in ann_topk_ivf(e, k=10).collect()]
    disk = [tuple(r) for r in ann_topk_ivf_persisted(spark, index_path, k=10).collect()]
    assert mem == disk
    assert len(disk) == 10


def test_probe_plan_prunes_cell_partitions(spark, index_path):
    df = ann_topk_ivf_persisted(spark, index_path, k=10)
    plan = explain_str(df)
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert scan_lines, plan
    # the candidate scan carries cell IN (...) — the pruning predicate
    assert any("cell" in l for l in scan_lines), scan_lines


def test_artifact_layout_is_cell_partitioned(spark, index_path):
    import glob
    import os

    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(f"{index_path}/cells/cell=*")
    )
    assert len(dirs) == N_CENTROIDS
    # meta pins the probe configuration
    m = spark.read.parquet(f"{index_path}/meta").collect()[0]
    assert (m["n_centroids"], m["n_probe"]) == (N_CENTROIDS, N_PROBE)


def test_meta_mismatch_fails_loudly(spark, index_path, tmp_path):
    bad = str(tmp_path / "bad-ivf")
    import shutil

    shutil.copytree(index_path, bad)
    spark.createDataFrame(
        [(99, 8, 2, 1)],
        "version int, n_centroids int, n_probe int, kmeans_iters int",
    ).write.mode("overwrite").parquet(f"{bad}/meta")
    with pytest.raises(ValueError, match="rebuild the index"):
        ann_topk_ivf_persisted(spark, bad, k=10)


def test_probe_with_supplied_qvec_skips_lookup_and_matches(spark, sf_dir, index_path):
    from hive_serde_schema_gen_spark.operators.similarity import quantized

    e = load_table(spark, sf_dir, "embeddings")
    qvec = [
        int(x)
        for x in e.filter(F.col("vec_id") == 0)
        .select(quantized("embedding").alias("q"))
        .collect()[0]["q"]
    ]
    by_id = [tuple(r) for r in ann_topk_ivf_persisted(spark, index_path, k=10).collect()]
    by_vec = [
        tuple(r)
        for r in ann_topk_ivf_persisted(
            spark, index_path, k=10, qvec=qvec
        ).collect()
    ]
    assert by_id == by_vec


def test_extend_appends_under_existing_centroids(spark, sf_dir, tmp_path):
    """FAISS-add contract: persist over part of the corpus, extend with
    the rest — the probe must equal the in-memory path run with the SAME
    (part-trained) centroids over the FULL corpus."""
    from hive_serde_schema_gen_spark.operators.similarity import (
        _cell_assignments,
        build_ivf_index,
        extend_ivf_index,
        quantized,
    )
    from pyspark.sql import functions as SF

    e = load_table(spark, sf_dir, "embeddings")
    old = e.filter(SF.col("vec_id") < 400)
    new = e.filter(SF.col("vec_id") >= 400)
    path = str(tmp_path / "ivf-extend")
    persist_ivf_index(old, path)
    extend_ivf_index(new, path)

    cents, _ = build_ivf_index(old)  # same deterministic training
    eq = e.select(
        "vec_id", SF.posexplode(quantized("embedding")).alias("pos", "v")
    )
    assigned_full = (
        e.select("vec_id", quantized("embedding").alias("q"))
        .join(_cell_assignments(eq, cents), "vec_id")
        .localCheckpoint()
    )
    mem = [tuple(r) for r in ann_topk_ivf(e, k=10, index=(cents, assigned_full)).collect()]
    disk = [tuple(r) for r in ann_topk_ivf_persisted(spark, path, k=10).collect()]
    assert mem == disk
    # the appended vectors are actually probeable: at least one id >= 400
    # appears somewhere in a wider result (the corpus is isotropic, so
    # check membership rather than top-10 presence)
    wide = {
        r["vec_id"]
        for r in ann_topk_ivf_persisted(spark, path, k=100).collect()
    }
    assert any(v >= 400 for v in wide)


def test_cell_stats_balance(spark, index_path):
    from hive_serde_schema_gen_spark.operators.similarity import ivf_cell_stats

    rows = ivf_cell_stats(spark, index_path).collect()
    assert len(rows) == N_CENTROIDS
    assert sum(r["n_vecs"] for r in rows) == 500  # whole corpus indexed
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-12
    mean_balance = sum(r["balance"] for r in rows) / len(rows)
    assert abs(mean_balance - 1.0) < 1e-12
