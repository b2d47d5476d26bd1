"""Driver-side small-table DataFrames without the parallelize tax
(round 18, guide §1.2 per-task work).

``spark.createDataFrame(rows, schema)`` over a local Python list builds
an RDD-backed frame split into ``min(len(rows), defaultParallelism)``
parallelize slices, and EVERY evaluation pays one Python-worker round
per slice: a broadcast build evaluates all slices (~0.3 s extra per use
at 32 slices, measured), and a ``coalesce(1)`` write evaluates them
serially (~150 ms × slices — the round-18 centroid-write finding).

Going through pandas instead yields an Arrow-backed **LocalRelation**
(the ``inference.infer_props_schema`` lesson, round 6): zero jobs to
evaluate, rows embedded in the plan, broadcast builds read them
directly, and a write lands in one file with input row order preserved.
For the small tables the operators build constantly — centroid tables,
Hamming-ball probes, PQ lookup tables, LSH plane weights — this is the
right physical shape.  The parallelize(…, 1) single-slice form remains
as the fallback for rows pandas/Arrow cannot represent.

Not for anything sized with the data: a corpus-shaped list does not
belong on the driver at all (guide §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame(rows, schema)`` as an Arrow LocalRelation.

    Values are byte-identical to the stock list path for the integer /
    float / string / boolean tuples the operators pass (pytest-held);
    anything pandas/Arrow cannot convert falls back to a single-slice
    parallelize (one Python-worker evaluation instead of 32)."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        names = spark.createDataFrame([], schema).columns
        pdf = pd.DataFrame(rows, columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        )
