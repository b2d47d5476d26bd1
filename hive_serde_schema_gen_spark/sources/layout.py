"""Storage-layout introspection: the file-size audit that decides when to
run ``sinks.compact_parquet``, and schema-drift detection between dataset
snapshots — the parquet-side sibling of the Layer-A NDJSON schema evolution
(``cli.py --evolve-from``).

Both are driver-side metadata operations: they read file listings and
parquet footers, never data — O(files), not O(bytes), so they are safe to
run on every orchestrator tick even over a 100 TB table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def file_sizes(spark: SparkSession, df) -> list:
    """Byte size of every file backing ``df``, via Hadoop's FileSystem API
    (storage-agnostic: file://, hdfs://, s3a://).  Shared by
    :func:`layout_report` and ``sinks.compact_parquet`` so the FS access
    pattern lives in one place."""
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    jvm = spark.sparkContext._jvm
    sizes = []
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        sizes.append(p.getFileSystem(jconf).getFileStatus(p).getLen())
    return sizes


def layout_report(spark: SparkSession, path: str, target_mb: int = 256) -> dict:
    """File-layout health of a parquet dataset: count, bytes, size quantiles,
    the small-file fraction, and the file count a compaction at
    ``target_mb`` would produce.  Sizes come from Hadoop's FileSystem API
    (works on file://, hdfs://, s3a://).

    The number that matters at 100 TB is ``small_file_frac``: every file
    costs a liststatus entry, an open, and a footer read per scan — a table
    of 4 MB files wastes most of its scan time off the data path.  Rule of
    thumb: compact when the fraction of files under target/4 exceeds ~0.5
    (exactly the ``needs_compaction`` flag)."""
    df = spark.read.parquet(path)
    sizes = sorted(file_sizes(spark, df))
    n = len(sizes)
    total = sum(sizes)
    target = target_mb * 1024 * 1024
    q = lambda frac: sizes[min(n - 1, int(frac * n))] if n else 0  # noqa: E731
    small = sum(1 for s in sizes if s < target / 4)
    return {
        "n_files": n,
        "total_bytes": total,
        "p50_bytes": q(0.5),
        "p95_bytes": q(0.95),
        "small_file_frac": round(small / n, 3) if n else 0.0,
        "files_at_target": max(1, -(-total // target)) if n else 0,
        "needs_compaction": n > 0 and small / n > 0.5,
    }


@dataclass(frozen=True)
class FieldChange:
    field: str  # dotted path for nested fields
    kind: str  # "added" | "removed" | "retyped" | "nullability"
    before: str | None
    after: str | None


def _walk(schema: T.StructType, prefix: str = "") -> dict:
    out = {}
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        out[name] = (f.dataType.simpleString(), f.nullable)
        if isinstance(f.dataType, T.StructType):
            out.update(_walk(f.dataType, prefix=f"{name}."))
    return out


def schema_diff(old: T.StructType, new: T.StructType) -> list:
    """Field-level changes from ``old`` to ``new``, nested structs included
    (dotted paths).  A retyped nested struct reports both the struct field
    and its changed leaves — consumers usually alert on the leaf."""
    a, b = _walk(old), _walk(new)
    changes = []
    for name in sorted(a.keys() - b.keys()):
        changes.append(FieldChange(name, "removed", a[name][0], None))
    for name in sorted(b.keys() - a.keys()):
        changes.append(FieldChange(name, "added", None, b[name][0]))
    for name in sorted(a.keys() & b.keys()):
        (ta, na), (tb, nb) = a[name], b[name]
        if ta != tb:
            changes.append(FieldChange(name, "retyped", ta, tb))
        elif na != nb:
            changes.append(
                FieldChange(
                    name,
                    "nullability",
                    "nullable" if na else "required",
                    "nullable" if nb else "required",
                )
            )
    return changes


def snapshot_schema_diff(spark: SparkSession, old_path: str, new_path: str) -> list:
    """`schema_diff` between two parquet snapshots — footer reads only."""
    return schema_diff(
        spark.read.parquet(old_path).schema, spark.read.parquet(new_path).schema
    )
