"""Parquet table loaders for the driver-provided star schema
(``/root/repo/TESTDATA.md``): region nation customer supplier part orders
lineitem events documents embeddings.

Parquet scans get column pruning + predicate pushdown from Catalyst for free;
every query should show ``PushedFilters``/``ReadSchema`` restricted to what it
uses (checked in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region is
# 5 rows, nation 25 at every TPC-H SF — they do not grow with SF).
BROADCAST_ALWAYS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS), which Spark's parquet reader rejects;
        # read the raw int64 nanos and truncate to microseconds (the values
        # are µs-precision, so truncation is lossless).
        from pyspark.sql import functions as F  # noqa: F401

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so queries can use the SQL API interchangeably."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
