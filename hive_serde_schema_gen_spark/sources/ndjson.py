"""NDJSON source — the reference's only scan, Spark-native.

Operator 1 of SURVEY §2: the reference reads lines lazily
(``Source.fromFile(file).getLines``, ``/root/reference/Schemer.scala:11``).
Spark-side, a line scan is ``spark.read.text`` (DataFrame, splittable,
predicate/limit pushdown capable); once a schema exists — e.g. from our own
inference — the typed read is ``spark.read.schema(s).json``, which keeps
parsing JVM-side (Jackson) instead of per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema_infer import infer_path, to_spark_schema


def read_ndjson_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line scan: one ``value: string`` row per line."""
    return spark.read.text(path)


def read_ndjson(
    spark: SparkSession, path: str, mode: str = "FAILFAST", schema=None
) -> DataFrame:
    """Typed NDJSON read: infer the strictest schema with the Layer-A lattice
    (unless given), then load with Spark's JVM JSON reader.

    This is the end-to-end payoff of the engine: the reference only *prints*
    DDL; here the inferred schema immediately drives a typed distributed scan.
    ``???`` columns load as strings (``unknown_as_string=True``) because
    NullType is not readable back.
    """
    if schema is None:
        result = infer_path(spark, path, mode=mode)
        schema = to_spark_schema(
            result.schema, unknown_as_string=True, varchar_as_string=True
        )
    return spark.read.schema(schema).json(path)
