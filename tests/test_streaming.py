"""Streaming surface: windowed agg (oracle-tested separately), streaming
schema inference equivalence, and the custom stateful operator."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.schema_infer import infer_json_column
from hive_serde_schema_gen_spark.sources.tables import load_table, normalize_events_ts
from hive_serde_schema_gen_spark.streaming.infer_stream import infer_stream
from hive_serde_schema_gen_spark.streaming.windows import _stream_source_dir


def _events_stream(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return normalize_events_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_stream_source_dir(sf_dir))
    )


def test_streaming_inference_matches_batch(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir)
    q, acc = infer_stream(
        stream.select("props"), "props", checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_schema = infer_json_column(load_table(spark, sf_dir, "events"), "props")
    assert acc.schema == batch_schema
    assert acc.rows > 0
    assert "k " in acc.definition()


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Streaming dedup: dropDuplicatesWithinWatermark on (user_id,
    event_type) — state-bounded dedup, the streaming twin of dedup_exact.
    Against a static file set it must keep exactly one row per key pair."""
    stream = _events_stream(spark, sf_dir)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    name = f"sdedup_{int(time.time() * 1000)}"
    q = (
        deduped.select("user_id", "event_type")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(f"SELECT COUNT(*) n, COUNT(DISTINCT user_id || '/' || event_type) d FROM {name}").collect()[0]
    from hive_serde_schema_gen_spark.sources.tables import load_table

    want = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got["n"] == got["d"] == want


def test_stateful_running_totals(spark, sf_dir):
    from hive_serde_schema_gen_spark.streaming.stateful import (
        HAVE_STATE_API,
        running_user_totals,
    )

    if not HAVE_STATE_API:
        pytest.skip("streaming state API unavailable")
    stream = _events_stream(spark, sf_dir)
    out = running_user_totals(stream)
    name = f"stateful_{int(time.time() * 1000)}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per user must equal the batch totals
    result = spark.sql(
        f"SELECT user_id, max_by(n_events, n_events) AS n FROM {name} GROUP BY user_id"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["user_id"]: r["n"] for r in result.collect()}
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert got == want


def test_windowed_agg_runs_in_append_mode(spark, sf_dir):
    """The windowed half of the registered streaming query must use append
    mode (complete mode never evicts window state — a scale-killer on
    unbounded sources) and still produce every window of the finite source
    via the sentinel flush; the stateful half runs in update mode (keyed
    state emission); the round-11 interval-join half is append again
    (outer rows emit exactly once at watermark closure).  None may use
    complete mode."""
    from unittest.mock import patch

    from pyspark.sql.streaming import DataStreamWriter

    from hive_serde_schema_gen_spark.registry import all_queries

    seen_modes = []
    orig = DataStreamWriter.outputMode

    def spy(self, mode):
        seen_modes.append(mode)
        return orig(self, mode)

    with patch.object(DataStreamWriter, "outputMode", spy):
        df = all_queries()["streaming_window_counts"](spark, sf_dir)
        n = df.count()
    assert seen_modes == ["append", "update", "append"]
    assert n > 0


# ---------------------------------------------------------------------------
# Round-10: the PySpark version contract for applyInPandasWithState
# ---------------------------------------------------------------------------


def test_state_api_present_on_supported_pyspark():
    """This environment (pyspark >= 3.4 per README's floor) must expose
    the stateful API — HAVE_STATE_API False here means an environment
    regression, not an acceptable fallback."""
    import pyspark

    from hive_serde_schema_gen_spark.streaming import stateful

    major, minor = (int(x) for x in pyspark.__version__.split(".")[:2])
    assert (major, minor) >= (3, 4)
    assert stateful.HAVE_STATE_API is True


def test_missing_state_api_names_the_version_floor(monkeypatch):
    """On an unsupported PySpark the stateful operators fail FAST with the
    documented contract — the floor, the dependent slot, and the
    stateless fallback — never a bare NotImplementedError at driver
    time."""
    import pytest as _pytest

    from hive_serde_schema_gen_spark.streaming import stateful

    monkeypatch.setattr(stateful, "HAVE_STATE_API", False)
    with _pytest.raises(NotImplementedError) as ei:
        stateful.running_user_cents(None)
    msg = str(ei.value)
    assert "pyspark >= 3.4" in msg
    assert "streaming_window_counts" in msg
    assert "windows.py" in msg
    with _pytest.raises(NotImplementedError):
        stateful.running_user_totals(None)


@pytest.mark.skip(
    reason="documents the fallback story only: on pyspark < 3.4 the "
    "stateful component is unavailable by design and the "
    "streaming_window_counts slot's stateful rows would be served by the "
    "stateless windowed-aggregation path (streaming/windows.py); this "
    "repo pins >= 3.4 so the branch is never exercised here"
)
def test_fallback_on_old_pyspark():  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# Round 17: the Spark 4.x transformWithStateInPandas twin (VERDICT r16 #5)
# ---------------------------------------------------------------------------


def test_tws_api_present_on_spark4():
    """The session engine is pyspark >= 4.0, so the recommended 4.x state
    API must be available — HAVE_TWS_API False here is an environment
    regression (the portable applyInPandasWithState default keeps its own
    3.4-floor test above)."""
    import pyspark

    from hive_serde_schema_gen_spark.streaming import stateful

    major = int(pyspark.__version__.split(".")[0])
    assert major >= 4
    assert stateful.HAVE_TWS_API is True


def test_tws_running_totals_matches_portable_api(spark, sf_dir):
    """running_user_totals_tws (transformWithStateInPandas) must emit the
    same final per-user counters as the portable applyInPandasWithState
    operator and as a batch GROUP BY — the API swap changes the state
    machinery, never the semantics."""
    from hive_serde_schema_gen_spark.sources.tables import load_table
    from hive_serde_schema_gen_spark.streaming.stateful import (
        HAVE_TWS_RUNTIME,
        running_user_totals_tws,
    )

    if not HAVE_TWS_RUNTIME:
        pytest.skip(
            "transformWithStateInPandas needs the protobuf package at "
            "RUNTIME (its Python state server) — absent in this "
            "container; the operator itself is implemented and its API "
            "pin is asserted in test_tws_api_present_on_spark4"
        )
    stream = _events_stream(spark, sf_dir)
    out = running_user_totals_tws(stream)
    name = f"tws_{int(time.time() * 1000)}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.sql(
        f"SELECT user_id, max_by(n_events, n_events) AS n FROM {name} "
        "GROUP BY user_id"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["user_id"]: r["n"] for r in result.collect()}
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert got == want


def test_missing_tws_api_names_the_version_floor(monkeypatch):
    from hive_serde_schema_gen_spark.streaming import stateful

    monkeypatch.setattr(stateful, "HAVE_TWS_API", False)
    with pytest.raises(NotImplementedError) as ei:
        stateful.running_user_totals_tws(None)
    msg = str(ei.value)
    assert "pyspark >= 4.0" in msg
    assert "running_user_totals" in msg
