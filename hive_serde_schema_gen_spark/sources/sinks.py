"""Sinks: partitioned, bucketed, and curated-corpus writes — the layout half
of the 100 TB story.

- ``write_partitioned``: hive-style directory partitioning → partition
  pruning on read (a filter on the partition column skips whole directories).
- ``write_bucketed``: pre-shuffle by join key at write time; two tables
  bucketed the same way join WITHOUT an exchange (asserted in
  tests/test_layout.py) — at 100 TB this turns the nightly fact⋈fact join
  from the dominant shuffle into a local merge.
- ``write_curated``: the corpus-output composition of the above — partition
  dirs + in-partition sort for parquet row-group min/max pruning + per-file
  record cap (asserted in tests/test_sinks.py).

(The reference's only sink is stdout plus a generated ``LOAD DATA``
statement — ``Generator.scala:4``, ``Schemer.scala:114``.)
"""

from __future__ import annotations

from typing import Optional, Sequence

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


def write_curated(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("lang",),
    sort_within: Sequence[str] = ("doc_id",),
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write a curated corpus as pruning-friendly partitioned parquet.

    - ``partition_by``: low-cardinality routing columns (lang, source,
      date bucket) become hive-style directories — a reader filtering on
      them scans only the matching directories (PartitionFilters), the
      dominant I/O saving at 100 TB.  Keep cardinality bounded: every
      distinct combination is a directory and at least one file.
    - ``sort_within``: ``sortWithinPartitions`` (NOT a global ``orderBy`` —
      no extra range-shuffle stage) clusters rows inside each task's file,
      so parquet row-group min/max statistics prune reads on these keys.
    - ``max_records_per_file``: bounds file size regardless of task input
      skew (a skewed partition otherwise lands one giant file whose
      row-groups a single reader must own).
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
