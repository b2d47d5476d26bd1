"""Parquet sink for curated corpora — the write-side twin of ``tables.py``.

The reference's only sink is stdout plus a generated ``LOAD DATA`` statement
(``Generator.scala:4``, ``Schemer.scala:114``); a 100 TB pipeline instead
lands its output as partitioned parquet whose LAYOUT is the read-path
optimization: hive-style partition directories give Catalyst partition
pruning, in-partition sort gives parquet row-group min/max pruning on the
sort keys, and a per-file record cap keeps any single file / task bounded.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


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
