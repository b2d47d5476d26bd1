"""Additional batch sources beyond parquet/NDJSON: CSV, ORC, XML, JDBC.

The reference reads exactly one format (line-delimited text,
``Schemer.scala:11``); a complete engine speaks the standard lake formats.
All readers return plain DataFrames so downstream operators are
source-agnostic.  JDBC is gated behind driver availability (no JDBC driver
jars ship in this environment); Avro/Kafka/Delta need external modules this
environment cannot fetch, so they stay out of scope.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an explicit schema preferred — ``inferSchema=True`` triggers
    an extra full scan, which is wrong at scale; when no schema is given we
    accept that cost explicitly."""
    reader = spark.read.option("header", str(header).lower()).option(
        "delimiter", delimiter
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: columnar with pushdown/pruning like parquet."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema=None,
) -> DataFrame:
    """XML (built into Spark since 4.0): one row per ``row_tag`` element.
    As with CSV, pass an explicit schema at scale — schema inference costs
    an extra full scan of the files."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC with parallel range partitioning — without partitionColumn a
    JDBC read is a single-task bottleneck, so the parallel form is the
    default posture.  Raises a clear error when no driver jar is present."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - driver-jar dependent
        raise RuntimeError(
            "JDBC read failed - a JDBC driver jar must be on the Spark "
            f"classpath (spark.jars). Underlying error: {e}"
        ) from e
