"""Z-order clustered writes: row-group/file min-max footers must prune
selective filters on BOTH clustered dimensions, where a linear sort prunes
only its own column.  Verified against raw parquet footers via pyarrow —
the same statistics Spark's parquet reader uses for row-group skipping."""

from __future__ import annotations

import glob
import os
import random

import pyarrow.parquet as pq
import pytest

from hive_serde_schema_gen_spark.sources.sinks import write_zordered, zorder_value

N_FILES = 16


def _grid(spark, n_side=100):
    rows = [(i % n_side, i // n_side) for i in range(n_side * n_side)]
    random.Random(3).shuffle(rows)
    return spark.createDataFrame(rows, "x int, y int")


def _overlapping_files(path, col, lo, hi):
    """Files whose [min,max] footer range for ``col`` intersects [lo, hi] —
    a reader must touch exactly these."""
    hit, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        total += 1
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit, total


# The physical layout write_zordered produces depends on session state:
# repartitionByRange samples boundaries (sampleSizePerPartition), AQE can
# re-plan the exchange, and approxQuantile merges per-partition summaries.
# The suite-shared Spark session lets earlier test modules mutate that
# state, which flipped one file's footer range past the pruning bound in
# a full-suite run (r15 verdict #2).  Pin every layout-relevant conf for
# the duration of the writes — near-full range sampling makes the
# boundaries ≈ exact quantiles, independent of prior session history.
_LAYOUT_CONFS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": str(N_FILES),
    "spark.sql.execution.rangeExchange.sampleSizePerPartition": "2000",
}


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    saved = {}
    for k, v in _LAYOUT_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        # hash-repartition the input so the write sees a partitioning
        # derived from the data, not from whatever parallelize slicing
        # the session's current state produces
        d = _grid(spark).repartition(8, "x", "y")
        zpath, lpath = str(base / "z"), str(base / "linear")
        write_zordered(d, zpath, ["x", "y"], n_files=N_FILES)
        # linear baseline: globally range-clustered on x only
        d.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.mode(
            "overwrite"
        ).parquet(lpath)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return d, zpath, lpath


def test_round_trip(spark, layouts):
    d, zpath, _ = layouts
    got = sorted((r["x"], r["y"]) for r in spark.read.parquet(zpath).collect())
    want = sorted((r["x"], r["y"]) for r in d.collect())
    assert got == want


def test_zorder_prunes_both_dims(layouts):
    _, zpath, _ = layouts
    for col in ("x", "y"):
        hit, total = _overlapping_files(zpath, col, 0, 9)  # 10% selectivity
        assert total == N_FILES
        # a 1/16-of-curve file covers ~a quadrant of each dim; a 10% slab
        # intersects only the first quadrant column
        assert hit <= total // 2, f"{col}: {hit}/{total} files overlap"


def test_linear_sort_prunes_only_leading_dim(layouts):
    _, _, lpath = layouts
    hit_x, total = _overlapping_files(lpath, "x", 0, 9)
    assert hit_x <= 3  # sorted column prunes hard
    hit_y, _ = _overlapping_files(lpath, "y", 0, 9)
    assert hit_y >= total - 1  # unsorted column: every file spans all of y


def test_zorder_beats_linear_on_second_dim(layouts):
    _, zpath, lpath = layouts
    z_hit, _ = _overlapping_files(zpath, "y", 0, 9)
    l_hit, _ = _overlapping_files(lpath, "y", 0, 9)
    assert z_hit < l_hit


def test_zorder_value_skew_resistant(spark):
    # heavily skewed column: quantile bucketing must still spread rows
    # across buckets (uniform min/max binning would collapse the head)
    rows = [(i, int(1.5 ** min(i % 40, 30))) for i in range(2000)]
    d = spark.createDataFrame(rows, "id int, v long")
    z = d.select(zorder_value(d, ["v"], n_bits=4).alias("z"))
    n_distinct = z.distinct().count()
    assert n_distinct >= 8  # at least half the 16 buckets populated


def test_zorder_validates_bit_budget(spark):
    d = _grid(spark, n_side=4)
    with pytest.raises(ValueError):
        zorder_value(d, ["x"] * 9, n_bits=8)
    with pytest.raises(ValueError):
        zorder_value(d, [], n_bits=8)
