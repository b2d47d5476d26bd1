"""Exactly-once streaming sinks via idempotent ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``:
after a crash, the last uncommitted epoch is REPLAYED with the same
``epoch_id`` and the same rows.  Exactly-once therefore reduces to making
the batch write idempotent, which this module does with the standard
two-step pattern:

1. write the batch to a path *deterministic in the epoch id*
   (``out/epoch=<id>/``) with ``mode("overwrite")`` — a replay of a
   half-written epoch overwrites the same files instead of appending
   duplicates;
2. only then record the epoch in a commit ledger — a replay of an
   already-committed epoch is skipped entirely.

A crash between (1) and (2) re-runs the overwrite (harmless); a crash after
(2) skips (harmless).  On a cluster the ledger marker is an object-store
object or a transactional-table commit (Delta's ``txnAppId``/``txnVersion``
encode exactly this); the local-filesystem marker here is the same protocol.

This is the pattern ``streaming/infer_stream.py`` uses for side effects,
promoted to a reusable sink with replay tests (``tests/test_exactly_once.py``).
"""

from __future__ import annotations

import os


def idempotent_epoch_sink(out_dir: str):
    """Build a ``foreachBatch`` handler writing each epoch exactly once.

    Returns ``handler(batch_df, epoch_id)`` suitable for
    ``writeStream.foreachBatch(...)``.  Layout::

        out_dir/epoch=<id>/part-*.parquet   -- the batch's rows
        out_dir/_ledger/epoch-<id>          -- commit marker (written last)
    """
    ledger = os.path.join(out_dir, "_ledger")

    def handler(batch_df, epoch_id: int) -> None:
        marker = os.path.join(ledger, f"epoch-{epoch_id}")
        if os.path.exists(marker):
            return  # replay of a committed epoch: skip, exactly-once holds
        # (1) deterministic path + overwrite: replays of an uncommitted
        # epoch converge to one copy
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        # (2) commit AFTER the data is durable
        os.makedirs(ledger, exist_ok=True)
        with open(marker, "w") as f:
            f.write("committed\n")

    return handler


def read_committed(spark, out_dir: str):
    """Read back only COMMITTED epochs (uncommitted epoch dirs — crash
    leftovers — are invisible, like uncommitted Delta files)."""
    ledger = os.path.join(out_dir, "_ledger")
    if not os.path.isdir(ledger):
        return None
    epochs = [
        os.path.join(out_dir, f"epoch={m.split('-', 1)[1]}")
        for m in sorted(os.listdir(ledger))
    ]
    if not epochs:
        # a crash between makedirs(_ledger) and the first marker write
        # leaves an empty ledger dir — that means "no committed epochs",
        # not an error (spark.read.parquet() with zero paths would raise)
        return None
    return spark.read.parquet(*epochs)
