"""Continuous-ingest dedup against the PERSISTED MinHash index — the
production composition of ``operators/dedup_index.py`` with Structured
Streaming: every micro-batch probes the on-disk index, keeps only novel
documents, appends the survivors to BOTH the curated output and the index,
so later batches (and later days) dedup against everything ever accepted.

This is the third leg of the dedup-family stool:

- batch:      ``dedup.minhash_lsh_pairs`` (corpus self-join)
- streaming:  ``streaming/dedup.py`` (state within a watermark horizon)
- ingest:     THIS — unbounded history at O(batch) cost per batch, because
  the history lives in the index artifact, not in streaming state.

Idempotence under replay (foreachBatch is at-least-once): two mechanisms.
(1) The curated output is a deterministic per-epoch directory with
overwrite — a replayed epoch rewrites the same files (the ``exactly_once``
sink recipe).  (2) The probe IGNORES matches against doc_ids present in
the incoming batch itself: when an epoch replays after its index extend
already committed, every batch doc is now in the index and would match
ITSELF (est_jaccard 1.0), which would empty ``novel`` and overwrite the
epoch dir with nothing — permanently losing the accepted docs.  Filtering
out batch-self matches makes the replay recompute the same ``novel`` set.
The exclusion is safe against cross-epoch RE-DELIVERY (the same doc_id
re-sent in a later epoch — the most common duplication pattern in real
feeds) because index signature rows are stamped with the epoch that wrote
them: before probing, batch ids already indexed under a DIFFERENT epoch
(or a None epoch: batch-built history) are rejected outright, so only
this epoch's own replayed entries ever reach the self-match exclusion.  Index appends ARE
duplicated by a replay, deliberately: duplicate band/sig rows are
semantically harmless (the probe's candidate `distinct` collapses them;
signature rows per doc are identical copies) and are reclaimed by the
next ``build_minhash_index`` compaction — cheaper than a transactional
ledger on the hot ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import keep_first_per_content
from ..operators.dedup_index import (
    dedup_against_index,
    extend_minhash_index,
    novel_docs,
)


def _novel_for_batch(
    batch: DataFrame, index_path: str, intra_batch: bool, epoch_id: int
) -> DataFrame | None:
    """The shared probe pipeline: [intra-batch exact dedup] → cross-epoch
    re-delivery rejection → index probe (broadcast batch, index never
    shuffles; batch-self matches excluded — see module docstring) →
    checkpointed novel survivors.  ONE definition on purpose: the
    re-delivery guard and the batch-self-match exclusion are the subtle
    replay-correctness joins, and two copies would drift.

    Re-delivery guard: a doc_id already in the index under a DIFFERENT
    epoch (or a None epoch: batch-built history) is a re-sent id — without
    this it would match its own index entry, have the match discarded as
    a batch-self match, and be silently re-admitted.  Same-epoch entries
    are this epoch's own replayed extend and must NOT reject (that is the
    data-loss replay bug the self-match exclusion fixes).  Scale shape:
    the index side is a column-pruned (doc_id, epoch) scan semi-joined
    against the BROADCAST batch ids — map-side over the index scan, the
    hits are <= batch-sized, and the final anti-join broadcasts them."""
    if batch.isEmpty():
        return None
    batch = batch.localCheckpoint()  # reused by probe + anti-join
    if intra_batch:
        batch = keep_first_per_content(batch).localCheckpoint()
    sigs = batch.sparkSession.read.parquet(f"{index_path}/sigs")
    if "epoch" in sigs.columns:
        foreign = (
            sigs.filter(~F.col("epoch").eqNullSafe(F.lit(epoch_id)))
            .select("doc_id")
            .join(F.broadcast(batch.select("doc_id")), "doc_id", "left_semi")
            .distinct()
        )
        batch = batch.join(
            F.broadcast(foreign), "doc_id", "left_anti"
        ).localCheckpoint()
        if batch.isEmpty():
            return None
    matches = dedup_against_index(batch, index_path).join(
        batch.select(F.col("doc_id").alias("matched_doc_id")),
        "matched_doc_id",
        "left_anti",
    )
    return novel_docs(batch, matches).localCheckpoint()


def process_ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    out_path: str,
    intra_batch: bool = True,
    digest_sketch: bool = False,
) -> None:
    """One micro-batch → novel survivors → epoch-dir write + index extend.
    Exposed as a plain function so the replay path is directly testable.

    ``digest_sketch=True`` also maintains the Theta recrawl-triage
    artifact per epoch (``dedup_index.recrawl_triage``) — an epoch
    REPLAY re-appends an identical-content sketch, which unions to the
    same set (Theta set semantics), so the replay-idempotence contract
    of this function is unchanged.  Triage is an observability/sizing
    signal: the probe still runs for every batch (a sketch estimate must
    never DROP data)."""
    novel = _novel_for_batch(batch, index_path, intra_batch, epoch_id)
    if novel is None:
        return
    # deterministic per-epoch dir + overwrite = replay-idempotent
    novel.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")
    # owner = the pipeline's stable identity (one ingest query per output
    # corpus): a post-crash restart re-acquires its own stale writer lease
    # instead of deadlocking on it, while a FOREIGN writer (a maintenance
    # compaction) still conflicts loudly.
    extend_minhash_index(
        novel, index_path, epoch=epoch_id, owner=f"ingest:{out_path}",
        digest_sketch=digest_sketch,
    )


def start_ingest_dedup(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    intra_batch: bool = True,
    query_name: str = "ingest_dedup",
    digest_sketch: bool = False,
):
    """Start the ingest query over an input ``stream`` of (doc_id, text, …)
    rows.  Returns the StreamingQuery.

    ``intra_batch`` keeps the smallest-id copy of exact duplicates WITHIN
    one batch (two copies arriving together are both absent from the index
    — the probe alone cannot see them); intra-batch NEAR-dups are likewise
    invisible to the probe until the next batch — when they matter, run
    the batch verifier over the (small) novel set in-line before the
    write, at O(novel² bounded-by-LSH) cost."""

    def _process(batch: DataFrame, epoch_id: int) -> None:
        process_ingest_batch(
            batch, epoch_id, index_path, out_path, intra_batch=intra_batch,
            digest_sketch=digest_sketch,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def read_ingested(spark, out_path: str) -> DataFrame:
    """The accepted corpus across all epochs (epoch dirs are hive-style
    partitions, so readers can also prune by epoch range)."""
    return spark.read.option("basePath", out_path).parquet(f"{out_path}/epoch=*")


def process_ingest_batch_manifest(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    table,
    intra_batch: bool = True,
) -> None:
    """Manifest-backed twin of :func:`process_ingest_batch`: novel docs
    commit to a ``sources.manifest.ManifestTable`` via ``commit_once(key=
    epoch)`` — replays are version-level no-ops, readers get ATOMIC
    current-snapshot reads (``table.read()``) instead of epoch-dir globs,
    and the accepted corpus gains time travel and safe compaction for
    free.

    Ordering matters: the index extend runs BEFORE (and regardless of)
    the commit.  Gating the extend on a successful first commit would
    open a crash window — commit lands, driver dies before the extend,
    every replay sees the key marker and skips the extend FOREVER, and
    later duplicates of this epoch's docs probe clean and get admitted.
    Extend-first means a replay at worst re-extends (duplicate index rows
    are tolerated by design) and the key marker guarantees at most one
    corpus commit."""
    novel = _novel_for_batch(batch, index_path, intra_batch, epoch_id)
    if novel is None:
        return
    extend_minhash_index(
        novel, index_path, epoch=epoch_id, owner=f"ingest:{table.path}"
    )
    table.commit_once(novel, key=epoch_id)
