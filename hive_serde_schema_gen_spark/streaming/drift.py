"""Streaming classifier-drift monitor: the per-epoch integer drift
report (`operators/logreg.score_drift_report` — zero-filled score
histogram bins + quantized score mass) maintained CONTINUOUSLY from a
document stream, one report partition per micro-batch epoch, with the
trailing-window anomaly scan (`operators/validation.metric_anomalies`,
exact-int mode) runnable at any time over the accumulated table.

The production shape: a recrawl/ingest stream is scored by the FROZEN
fitted model (weights + Platt step pinned when the monitor starts — a
drift monitor that refits per batch would hide the drift it exists to
catch), each epoch lands an O(bins+1)-row integer report, and an
orchestrator polls ``drift_flags`` after each epoch — "did my quality
classifier drift this recrawl?" as a standing stream job.

All epoch writes are deterministic overwrite directories, so foreachBatch
replays rewrite the same files (the ``exactly_once``/``ingest.py``
recipe); an EMPTY epoch still lands all-zero series rows — a vanishing
epoch would be invisible to the trailing window, while a zero epoch is
(correctly) a flaggable collapse of the scored volume.

Batch parity: the accumulated report table equals
``score_drift_report`` over the same documents with the same epoch
assignment row-for-row, so ``drift_flags`` equals the batch
``classifier_drift`` — pinned in tests/test_streaming_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.logreg import (
    DRIFT_BINS,
    DRIFT_QUANT,
    classifier_score_calibrated,
    drift_series_labels,
    score_drift_report,
)

# epoch rides the partition DIRECTORY (epoch=N), not the data — storing
# it in both places would collide at partition-discovery read time
_REPORT_SCHEMA = "check string, metric long"


def process_drift_batch(
    batch: DataFrame,
    epoch_id: int,
    weights: DataFrame,
    cal_params: DataFrame,
    report_path: str,
    bins: int = DRIFT_BINS,
    quant: int = DRIFT_QUANT,
    hash_fn: str = "xxhash64",
    n_buckets: int = 1 << 18,
    max_ngram: int = 2,
) -> None:
    """One micro-batch: score with the frozen model, reduce to the
    epoch's integer drift-report rows, land them at
    ``report_path/epoch=N`` (deterministic overwrite — replay-safe).
    Exposed as a plain function so replay and parity are directly
    testable."""
    spark = batch.sparkSession
    if batch.isEmpty():
        # zero rows for EVERY series score_drift_report would emit — the
        # labels come from its own definition, so the shapes can't drift
        rows = [(c, 0) for c in drift_series_labels(bins)]
        report = spark.createDataFrame(rows, _REPORT_SCHEMA)
    else:
        scored = classifier_score_calibrated(
            batch,
            weights,
            cal_params,
            n_buckets=n_buckets,
            max_ngram=max_ngram,
            hash_fn=hash_fn,
        ).withColumn("epoch", F.lit(int(epoch_id)))
        report = score_drift_report(
            scored, bins=bins, quant=quant
        ).select("check", F.col("metric").cast("long"))
    report.coalesce(1).write.mode("overwrite").parquet(
        f"{report_path}/epoch={epoch_id}"
    )


def start_drift_monitor(
    stream: DataFrame,
    weights: DataFrame,
    cal_params: DataFrame,
    report_path: str,
    checkpoint: str,
    query_name: str = "drift_monitor",
    **score_kwargs,
):
    """Start the monitor; returns the StreamingQuery.  ``weights`` /
    ``cal_params`` should be localCheckpointed by the caller — they are
    read once per epoch and must stay frozen for the monitor's
    lifetime."""

    def _process(batch: DataFrame, epoch_id: int) -> None:
        process_drift_batch(
            batch, epoch_id, weights, cal_params, report_path,
            **score_kwargs,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def drift_flags(
    spark,
    report_path: str,
    k: float = 3.0,
    min_history: int = 5,
    window: int = 100,
) -> DataFrame:
    """The orchestrator's poll: trailing-window z-scan over the
    accumulated report table — flagged (check, epoch, metric,
    trail_mean, trail_std, z) rows, exact-int cross-engine arithmetic.
    Reads O(epochs × (bins+1)) rows: metadata-sized at any corpus
    scale, so polling after every epoch is free."""
    from ..operators.validation import metric_anomalies

    reports = spark.read.parquet(report_path).select(
        "check", F.col("epoch").cast("long").alias("epoch"), "metric"
    )
    return metric_anomalies(
        reports, k=k, min_history=min_history, window=window,
        exact_int=True,
    )
