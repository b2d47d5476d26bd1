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
- ``write_zordered``: multi-dimensional clustering (Z-order / Morton curve,
  the Delta/Iceberg OPTIMIZE ZORDER feature Spark lacks natively) — a
  single sort key interleaving the quantile-bucket bits of several columns,
  so parquet row-group min/max statistics prune selective filters on ANY of
  the clustered dimensions, where a linear sort prunes only its leading
  column (asserted against raw parquet footers in tests/test_zorder.py).

(The reference's only sink is stdout plus a generated ``LOAD DATA``
statement — ``Generator.scala:4``, ``Schemer.scala:114``.)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 256,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> int:
    """Rewrite a parquet dataset into ~``target_mb``-sized files — the
    small-files compaction every long-lived ingest needs: a streaming or
    frequently-appended table accretes thousands of KB-scale files, and at
    100 TB the namenode/liststatus cost plus per-file open overhead starts
    to dominate scans (the classic small-files problem).

    Output file count = ceil(total_bytes / target): sizes come from the
    filesystem via Hadoop's FileSystem API, so the same call works on
    file://, hdfs:// and s3a:// paths.  With ``sort_by`` the rewrite
    range-partitions + sorts on those keys (restoring the row-group
    clustering appends destroyed — see ``extend_minhash_index``'s caveat);
    without, a plain ``repartition`` balances bytes evenly.  Returns the
    output file count.  Compact into a NEW path and swap atomically at the
    catalog/manifest layer — compact-in-place over the live path is a
    reader race; ``sources.manifest.ManifestTable.compact`` is that safe
    form (snapshot-atomic, old versions stay readable)."""
    from .layout import file_sizes

    df = spark.read.parquet(src_path)
    total = sum(file_sizes(spark, df))
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    df.write.mode(mode).parquet(dst_path)
    return n_out


def zorder_value(
    df: DataFrame, cols: Sequence[str], n_bits: int = 8
) -> Column:
    """Z-order (Morton) sort key over ``cols``: each column is mapped to its
    quantile bucket in ``[0, 2^n_bits)`` and the buckets' bits are
    interleaved into one long, so rows close on the Z-curve are close in
    EVERY clustered dimension simultaneously.

    Quantile bucketing (one driver-side ``approxQuantile`` per column at
    write time, boundaries ride the plan as an array literal), not
    min/max-uniform ``width_bucket``: a skewed column would otherwise
    collapse most rows into a few bins and lose its share of the
    interleave.  The per-row bucket lookup is ``size(filter(bounds, b ->
    b <= v))`` over the 2^n_bits-element literal — an interpreted
    higher-order lambda, acceptable at WRITE time (reads, where the win
    lives, never evaluate it); 8 bits/dim keeps the scan short and is
    plenty for row-group-granularity skipping.  NULLs land in bucket 0
    (cluster first).  Bit budget: ``n_bits * len(cols)`` must fit a long —
    8 bits × up to 7 dims does."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    n_bins = 1 << n_bits
    if n_bits * len(cols) > 62:
        raise ValueError("n_bits * len(cols) must be <= 62")
    probs = [i / n_bins for i in range(1, n_bins)]
    rel_err = 1.0 / (4 * n_bins)
    buckets = []
    for c in cols:
        bounds = sorted(
            set(
                df.select(F.col(c).cast("double").alias("__v")).approxQuantile(
                    "__v", probs, rel_err
                )
            )
        )
        v = F.col(c).cast("double")
        buckets.append(
            F.size(F.filter(F.lit(bounds), lambda b: b <= v)).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(n_bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * len(cols) + j)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int = 32,
    n_bits: int = 8,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet globally clustered on the Z-curve of ``zorder_cols``.

    ``repartitionByRange`` on the z-value splits the curve into ``n_files``
    contiguous segments (one range-shuffle — the same cost a global
    ``orderBy`` would pay) and ``sortWithinPartitions`` orders rows inside
    each, so every parquet row group covers a small Z-interval ≈ a small
    hyper-rectangle in the clustered dimensions.  A reader filtering
    selectively on ANY clustered column then skips most row groups via
    min/max statistics — the multi-dimensional generalization of
    ``write_curated``'s single-key ``sort_within``.  At 100 TB this is the
    difference between "point lookups on (user, day) read one file" and
    "every query scans the corpus": pick 2–4 genuinely-filtered columns;
    more dims dilute each one's locality."""
    z = zorder_value(df, zorder_cols, n_bits=n_bits)
    clustered = (
        df.withColumn("__zval", z)
        .repartitionByRange(n_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
    writer = clustered.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)

def write_training_shards(
    selected: DataFrame,
    path: str,
    epoch: int,
    context_len: int,
    n_shards: int,
    key_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    salt: str = "shuffle-v1",
    hash_fn: str = "xxhash64",
    mode: str = "overwrite",
) -> None:
    """Export one training epoch as shard files a loader consumes
    sequentially: `packing.training_manifest` lays out the epoch (shard,
    within-shard order, token offset, chunk range), then each shard
    lands as ONE parquet file sorted in consumption order.

    The physical shape is the point: ``repartition(shard)`` routes each
    shard to exactly one task and ``sortWithinPartitions(order_hash)``
    is the same per-shard sort the manifest's offsets were defined over,
    so the rows in every file are in training order and the ``offset``
    column is the file's running token count — a loader needs no
    shuffle, no sort, and no index, just a sequential scan of
    ``shard=N``.  Everything is hash-deterministic: a resumed or
    replayed export rewrites byte-identical shard memberships (the
    ``exactly_once`` discipline, applied to training data).

    Scale: one shuffle (the hash partition by shard); pick ``n_shards``
    so a shard is file-sized (~100-500 MB) — shards are simultaneously
    the write parallelism, the file-size bound, and the loader's unit
    of work."""
    from ..operators.packing import training_manifest

    m = training_manifest(
        selected, epoch, context_len, n_shards,
        key_col=key_col, n_tokens_col=n_tokens_col,
        salt=salt, hash_fn=hash_fn,
    )
    (
        m.repartition(n_shards, "shard")
        # "shard" leads the sort: Spark's V1 partitioned write requires an
        # ordering on the partition column and would otherwise insert its
        # own SortExec on shard — stable in memory but NOT once the sorter
        # spills, which would scramble the in-file training order at
        # production scale.  With shard leading, the required ordering is
        # already satisfied and no implicit sort is inserted.
        .sortWithinPartitions("shard", "order_hash", key_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
