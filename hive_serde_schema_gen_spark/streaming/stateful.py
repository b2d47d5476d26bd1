"""Custom stateful streaming operator: per-user running counters via
``applyInPandasWithState`` — the escape hatch for stateful logic Spark's
built-in aggregations can't express (guide: "custom stateful operators").

State per key is a tiny tuple (count, total value); the watermark-less
ProcessingTimeTimeout config keeps the example self-contained.  At scale,
state lives in the state store (RocksDB on executors), partitioned by key —
the operator shuffles once on user_id and stays incremental forever.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

try:  # structured-streaming stateful API (present in pyspark >= 3.4)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    HAVE_STATE_API = True
except ImportError:  # pragma: no cover
    HAVE_STATE_API = False


def _require_state_api() -> None:
    """Fail fast WITH the version contract (README pins the floor): the
    registered ``streaming_window_counts`` slot depends on this API, so
    an unsupported PySpark must name the floor and the fallback, never
    raise a bare NotImplementedError at driver time."""
    if not HAVE_STATE_API:  # pragma: no cover
        import pyspark

        raise NotImplementedError(
            "applyInPandasWithState requires pyspark >= 3.4 (found "
            f"{pyspark.__version__}); the streaming_window_counts slot's "
            "stateful component depends on it — upgrade PySpark, or use "
            "the stateless windowed-aggregation path in streaming/"
            "windows.py which expresses the same counters without custom "
            "state"
        )

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream_df):
    """events stream → per-user running (count, total value), updated each
    micro-batch."""
    _require_state_api()
    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CENTS_OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
CENTS_STATE_SCHEMA = "n long, cents long"


def _update_cents(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
) -> Iterable[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum()) if len(pdf) else 0
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_cents(stream_df):
    """Oracle-exact flavor of ``running_user_totals``: the money column
    arrives PRE-QUANTIZED to integer cents (``value`` cast to
    DECIMAL(12,2) × 100 → long, done ENGINE-side — the one double→decimal
    rounding path Spark and DuckDB demonstrably share), so the Python state
    update only ever adds integers.  Integer addition commutes exactly:
    the final per-user totals are bit-identical to a batch GROUP BY no
    matter how the stream is micro-batched — which is what lets this
    operator sit inside a driver-hashed correctness row
    (``streaming_window_counts``) rather than a rows-only check."""
    _require_state_api()
    from pyspark.sql import functions as F

    return (
        stream_df.select(
            "user_id",
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cents,
            outputStructType=CENTS_OUTPUT_SCHEMA,
            stateStructType=CENTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
