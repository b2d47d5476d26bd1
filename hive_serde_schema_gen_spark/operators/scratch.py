"""Slot scratch-dir hygiene (round 13): several driver-oracle slots
build a persisted index / file fixture in a fresh temp dir at query
time and return frames that lazily read it.  Before this helper each
invocation leaked its ``tempfile.mkdtemp`` directory — bounded MBs per
sweep, but a long-lived driver session running 50-slot correctness
sweeps accumulates them without bound (the round-12 verdict's
hardening finding #3).

``with_slot_scratch`` is the shared shape: make the dir, let the slot
build its evidence, EAGERLY materialize every returned DataFrame
(``localCheckpoint`` — after which nothing reads the dir again), then
best-effort-remove the dir even when the build raises.  The eager
checkpoint is the load-bearing step: a lazy frame handed to the driver
would read parquet files the ``finally`` just deleted.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame


def with_slot_scratch(prefix: str, build: Callable):
    """Run ``build(path)`` against a fresh scratch dir and return its
    result with every DataFrame eagerly checkpointed; the dir is removed
    (best-effort) before returning.  ``build`` may return one DataFrame
    or a tuple mixing DataFrames and plain values."""
    path = tempfile.mkdtemp(prefix=prefix)
    try:
        out = build(path)
        if isinstance(out, DataFrame):
            return out.localCheckpoint()
        return tuple(
            o.localCheckpoint() if isinstance(o, DataFrame) else o
            for o in out
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
