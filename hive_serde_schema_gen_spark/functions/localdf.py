"""Single-slice local DataFrames (round 18, guide §1.2 per-task work).

``spark.createDataFrame(rows, schema)`` parallelizes a local Python list
into ``min(len(rows), defaultParallelism)`` slices, and EVERY evaluation
of the resulting RDD-backed frame pays one Python-worker round per
slice: a broadcast build evaluates all slices (~0.3 s extra per use at
32 slices, measured), and a ``coalesce(1)`` write evaluates them
serially (~150 ms × slices — the round-18 centroid-write finding).  For
the small driver-side tables the operators build constantly — centroid
tables, Hamming-ball probes, PQ lookup tables, LSH plane weights — one
slice is always enough and keeps the frame one Python-worker evaluation
with row order exactly the input order.

Not for anything sized with the data: a corpus-shaped list does not
belong on the driver at all (guide §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame(rows, schema)`` built as ONE parallelize slice.

    Same verification/coercion path as the list form (the RDD rows run
    through the identical schema conversion); empty input falls back to
    the stock builder (``parallelize([], 1)`` yields an empty slice the
    conversion handles, but the stock path's empty-local-relation plan
    is simpler)."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
