"""Streaming sessionization: native session windows over the events stream.

The batch twin (``operators/relational.py:sessionize_events``) sessionizes
with LAG + gap>30min over a static table; this is the unbounded-source
form: ``F.session_window`` merges events whose gap is under the threshold
into one growing window per (user, session), and the watermark closes a
session once no event can extend it — state per key is bounded by the open
sessions inside the lateness allowance, the property that lets it run
forever (the batch LAG window would need the full history).

Boundary semantics: the batch rule starts a new session at gap > G; the
native session window starts one at gap >= G.  The two differ only when an
inter-event gap equals G exactly (microsecond-exact), which the equivalence
test (tests/test_streaming_sessions.py) measures rather than assumes.

Append mode: a session row is emitted exactly once, when the watermark
passes its close — the scale-correct mode (complete mode would re-emit and
never evict; cf. streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_user_sessions(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """events stream → one row per CLOSED session:
    (user_id, session_start, session_end, n_events).

    The groupBy key is (session_window, user_id): Spark keeps one merging
    window state per user per open session and evicts it when the
    watermark passes ``session_end`` — emitted exactly once in append
    mode."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
