"""Sinks: partitioned and bucketed writes — the layout half of the 100 TB
story.

- ``write_partitioned``: hive-style directory partitioning → partition
  pruning on read (a filter on the partition column skips whole directories).
- ``write_bucketed``: pre-shuffle by join key at write time; two tables
  bucketed the same way join WITHOUT an exchange (asserted in
  tests/test_layout.py) — at 100 TB this turns the nightly fact⋈fact join
  from the dominant shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.  Sorting within
    buckets additionally removes the sort from later sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
