"""SparkSession factory with the scale-aware defaults this engine assumes.

Local testing runs ``local[N]``; on a real cluster the same settings hold
(AQE re-plans shuffles at runtime, coalesces small partitions, and splits
skewed ones — the knobs that make 100 TB plans self-tuning).  Session
timezone is pinned to UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hive_serde_schema_gen_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # SPARK_GRAFT_UI=1 turns the UI (and its REST metrics API) on —
        # bench.py's shuffle-share instrumentation reads per-stage task
        # metrics from it; everything else runs headless
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    if not os.environ.get("SPARK_MASTER") and "SPARK_HOME_CLUSTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "16g")
    return builder.getOrCreate()


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Settings every oracle-compared query applies defensively at runtime —
    the driver may hand us a session with different conf."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
