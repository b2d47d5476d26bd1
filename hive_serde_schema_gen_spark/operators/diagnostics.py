"""Shuffle-skew diagnostics — the measurement half of the salting story
(``advanced.skew_salted_join`` is the cure; this is the instrument).

Before a 100-TB join/aggregate you want to KNOW whether a key is hot and
how many salt sub-keys would level it, not discover it from a straggler
task 4 hours in.  ``skew_report`` answers both in one map-side-combined
pass per key column.

(No reference counterpart — ``Schemer.scala`` has no join surface; this is
engine-side scale machinery.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    cols,
    k: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Top-``k`` hottest keys per column with the numbers that decide a
    salting strategy:

    - ``share``: the key's fraction of all rows;
    - ``skew_factor``: its count over the MEAN per-key count (1.0 = uniform;
      the classic hot-key smell is 100×+);
    - ``suggested_salt``: ``ceil(count / (rows / n_partitions))`` — the
      number of sub-keys that shrinks this key's largest shuffle partition
      to about an average one (1 = no salting needed).  ``n_partitions``
      defaults to ``spark.sql.shuffle.partitions``.

    One groupBy-count per column (map-side combined — a hot key is ONE row
    after partial aggregation, so the diagnostic itself cannot skew) + a
    driver-bounded top-k.  Run it on the join key of both sides before
    sizing ``SALT_BUCKETS``; re-run per ingest era, hot keys drift."""
    from pyspark.sql.window import Window as W

    if isinstance(cols, str):
        cols = [cols]
    if n_partitions is None:
        n_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    reports = []
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("key")).agg(
            F.count(F.lit(1)).alias("count")
        )
        totals = counts.agg(
            F.sum("count").alias("__rows"), F.count(F.lit(1)).alias("__keys")
        )
        # orderBy+limit plans as TakeOrderedAndProject — a distributed
        # per-partition top-k then driver merge, NEVER a single-partition
        # sort of all distinct keys; the rank window then runs over k rows
        w = W.orderBy(F.desc("count"), "key")
        top = (
            counts.orderBy(F.desc("count"), "key")
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .crossJoin(F.broadcast(totals))
        )
        reports.append(
            top.select(
                F.lit(c).alias("column"),
                "rank",
                "key",
                "count",
                (F.col("count") / F.col("__rows")).alias("share"),
                (F.col("count") * F.col("__keys") / F.col("__rows")).alias(
                    "skew_factor"
                ),
                F.ceil(
                    F.col("count") / (F.col("__rows") / F.lit(n_partitions))
                )
                .cast("int")
                .alias("suggested_salt"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
