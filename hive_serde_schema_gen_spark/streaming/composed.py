"""The composed curation stream — ingest dedup → frozen-model drift
monitoring → validation-gated sink, in ONE foreachBatch: the production
chain the three building blocks (``ingest.py``, ``drift.py``,
``quality_gate.py``) exist for, each individually replay-proven, here
composed so ONE micro-batch drives all three against the same epoch id.

Per micro-batch:

1. **probe**: the persisted-MinHash novel-docs pipeline
   (``ingest._novel_for_batch`` — intra-batch exact dedup, cross-epoch
   re-delivery rejection, batch-self-match exclusion);
2. **drift**: the frozen classifier scores the NOVEL stream and the
   epoch's integer drift report lands (``drift.process_drift_batch``
   semantics — what the pipeline is about to accept is what the monitor
   must watch; an empty-novel epoch still lands all-zero rows);
3. **gate**: the novel docs run the declarative check suite with
   quarantine routing (``quality_gate.process_gated_batch``) — accepted
   rows land in the curated output;
4. **extend**: ONLY accepted rows extend the index.  A quarantined
   batch must NOT poison the index: its docs were rejected, and a later
   corrected re-send has to probe clean and be admitted — extending on
   quarantined content would silently drop the fix forever.

Replay correctness is inherited, not re-invented: every write is a
deterministic ``epoch=N`` overwrite directory, the probe is
self-match-safe after its own extend committed, and duplicate index
rows from a replayed extend are tolerated by design — so a crash after
ANY prefix of the four steps replays to the identical end state
(asserted, step-by-step, in tests/test_streaming_composed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .drift import process_drift_batch
from .ingest import _novel_for_batch
from .quality_gate import process_gated_batch


def process_curated_ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    *,
    index_path: str,
    good_path: str,
    quarantine_path: str,
    gate_report_path: str,
    drift_report_path: str,
    weights: DataFrame,
    cal_params: DataFrame,
    checks,
    row_predicate: str | None = None,
    intra_batch: bool = True,
    score_kwargs: dict | None = None,
) -> None:
    """One micro-batch through the full chain (plain function — the
    replay interleavings are driven directly in tests)."""
    from ..operators.dedup_index import extend_minhash_index

    spark = batch.sparkSession
    novel = _novel_for_batch(batch, index_path, intra_batch, epoch_id)
    if novel is None:
        # an all-duplicate epoch is still an OBSERVED epoch: the drift
        # window and the gate report must see it, or a collapsed feed
        # (everything suddenly duplicate) would be invisible
        empty = spark.createDataFrame([], batch.schema)
        process_drift_batch(
            empty, epoch_id, weights, cal_params, drift_report_path,
            **(score_kwargs or {}),
        )
        process_gated_batch(
            empty, epoch_id, checks, good_path, quarantine_path,
            gate_report_path, row_predicate=row_predicate,
        )
        return
    process_drift_batch(
        novel, epoch_id, weights, cal_params, drift_report_path,
        **(score_kwargs or {}),
    )
    results = process_gated_batch(
        novel, epoch_id, checks, good_path, quarantine_path,
        gate_report_path, row_predicate=row_predicate,
    )
    # all([]) = True matches quality_gate's OWN rule: checks=[] means
    # predicate-only routing, the gate wrote ok_rows to good_path, and
    # the extend must follow (review r14 — bool(results) and ... left
    # accepted rows out of the index, re-admitting later re-deliveries)
    batch_ok = all(r["passed"] for r in results)
    if not batch_ok:
        return  # quarantined: nothing accepted, nothing indexed
    accepted = (
        novel.filter(row_predicate) if row_predicate is not None else novel
    )
    extend_minhash_index(
        accepted, index_path, epoch=epoch_id, owner=f"ingest:{good_path}"
    )


def start_curated_ingest(
    stream: DataFrame,
    checkpoint: str,
    query_name: str = "curated_ingest",
    **kwargs,
):
    """Start the composed query over a (doc_id, text, …) stream; returns
    the StreamingQuery.  ``kwargs`` are
    :func:`process_curated_ingest_batch` keywords."""

    def _process(batch: DataFrame, epoch_id: int) -> None:
        process_curated_ingest_batch(batch, epoch_id, **kwargs)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
