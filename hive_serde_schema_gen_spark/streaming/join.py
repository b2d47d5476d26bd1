"""Stream-stream joins with bounded state — the attribution-join shape
(click → purchase within an interval) every event pipeline needs.

Spark buffers BOTH sides of a stream-stream join in state; unbounded,
that state grows forever.  The two ingredients that bound it (and that
Spark requires for outer emission) are a watermark on each side and a
time-range join condition: a buffered left row can be evicted once the
right watermark passes ``left_ts + upper``, and vice versa — state per
key is then O(events inside the interval + lateness allowance), the
property that lets the join run indefinitely on a cluster.

Inner matches emit as soon as both rows have arrived; OUTER unmatched
rows emit only when the watermark proves no future match can exist —
exactly-once either way.  The batch twin is a plain range θ-join over
the static table (`tests/test_streaming_join.py` asserts row-set
equality for both modes, driven through the file-source harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join ``right`` events to the ``left`` events they follow within
    ``(0, max_delay]`` on the same key:

        right.ts  BETWEEN  left.ts  AND  left.ts + max_delay

    Right columns are prefixed (both sides usually share a schema).
    ``how``: ``inner`` or ``left_outer`` (unmatched left rows emit with
    null right columns once the watermark closes their interval)."""
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    rw = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    r_on, r_ts = f"{right_prefix}{on}", f"{right_prefix}{ts_col}"
    cond = (
        (F.col(r_on) == F.col(on))
        & (F.col(r_ts) >= F.col(ts_col))
        & (F.col(r_ts) <= F.col(ts_col) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)


def click_purchase_attribution(
    events_stream: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
    passthrough_types: tuple = (),
) -> DataFrame:
    """The concrete attribution pipeline over the ``events`` schema: each
    click joined to the purchases the same user made within
    ``max_delay`` of it.  Pass the same ``readStream`` source twice?  No —
    one stream, filtered two ways; Spark plans two scans of the source
    with independent state, the standard self-join shape.

    ``passthrough_types``: event types admitted through BOTH side filters
    in addition to click/purchase.  Needed by watermark-advancing sentinel
    rows in test/replay harnesses: a deterministic filter is pushed below
    the EventTimeWatermark node into the scan (the windows.py lesson), so
    a filtered-out sentinel never reaches the watermark collector and the
    outer join's unmatched rows never emit.  A passthrough row self-joins
    at most once (same key, same timestamp) — consumers drop it by its
    marker key, exactly as the batch side of the harness does."""
    clicks = events_stream.filter(
        F.col("event_type").isin("click", *passthrough_types)
    ).select("event_id", "ts", "user_id", "value")
    purchases = events_stream.filter(
        F.col("event_type").isin("purchase", *passthrough_types)
    ).select("event_id", "ts", "user_id", "value")
    j = streaming_interval_join(
        clicks, purchases, on="user_id", ts_col="ts",
        max_delay=max_delay, watermark=watermark, how=how,
    )
    return j.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
    )


def click_purchase_attribution_batch(events: DataFrame, max_delay: str = "30 minutes") -> DataFrame:
    """Batch twin on the static table — the equivalence oracle.  (At rest
    this is the bucketed-range-join problem; see
    ``operators/advanced.py:range_join_bucketed`` for the scale form.)"""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("p_user_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        "user_id", "click_id", "click_ts",
        "purchase_id", "purchase_ts", "purchase_value",
    )
