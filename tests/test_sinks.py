"""Partitioned-parquet sink: layout, round-trip, and pruning behavior."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.sources.sinks import write_curated
from hive_serde_schema_gen_spark.sources.tables import load_table


def test_layout_roundtrip_and_partition_pruning(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "curated")
    write_curated(d, out, partition_by=("lang",), sort_within=("doc_id",))

    # hive-style partition directories exist, one per distinct lang
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    dirs = {e for e in os.listdir(out) if e.startswith("lang=")}
    assert dirs == {f"lang={v}" for v in langs}

    # round-trip: same rows, partition column restored from the path
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in d.select("doc_id").collect()
    }

    # a lang filter prunes to ONE partition directory
    one = sorted(langs)[0]
    probe = back.filter(F.col("lang") == one)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :].splitlines()[0]
    pf = scan[scan.index("PartitionFilters") :].split("PushedFilters")[0]
    assert "lang" in pf, scan
    assert probe.count() == d.filter(F.col("lang") == one).count()


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "capped")
    write_curated(
        d,
        out,
        partition_by=(),
        sort_within=("doc_id",),
        max_records_per_file=100,
    )
    import pyarrow.parquet as pq

    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert files
    assert all(pq.read_metadata(f).num_rows <= 100 for f in files)
