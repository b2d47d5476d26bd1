"""Streaming windowed aggregation over the events table.

The query runs a real Structured Streaming pipeline (file source → watermark
→ tumbling-window aggregate → memory sink, driven to completion with
``processAllAvailable``) and returns the materialized result.  Because a
tumbling window over a static file set must equal the batch GROUP BY
time-bucket, the DuckDB oracle is exact — a strong equivalence check between
the streaming and batch planners.

Scale: with a real source (Kafka), the same code incrementally maintains
per-window partial aggregates in state; the watermark bounds state size by
evicting windows older than the lateness allowance.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import functions as F

from ..registry import query

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                        ".stream_scratch")


def _stream_source_dir(sf_dir: str) -> str:
    """Spark's file streaming source requires a *directory*; expose the
    single events.parquet through a scratch dir of symlinks (real
    deployments stream from a directory/Kafka anyway)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(_SCRATCH, key)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


@query(
    "streaming_window_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def streaming_window_counts(spark, sf_dir):
    """Tumbling 1-hour windows with a 30-minute watermark, executed as an
    actual streaming query on the parquet file source."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema  # ts: long (ns)
    stream_dir = _stream_source_dir(sf_dir)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(stream_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )
    name = f"stream_windows_{int(time.time() * 1000)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )
