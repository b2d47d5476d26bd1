"""Stream-stream interval join (`streaming/join.py`) vs the batch range
join — inner matches and left-outer watermark-closed non-matches."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.sources.tables import load_table, normalize_events_ts
from hive_serde_schema_gen_spark.streaming.join import (
    click_purchase_attribution,
    click_purchase_attribution_batch,
)
from hive_serde_schema_gen_spark.streaming.windows import (
    _SENTINEL_TYPE,
    _stream_source_dir,
    _write_sentinel,
)


def _drive(spark, sf_dir, how):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream_dir = _stream_source_dir(sf_dir)
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    name = f"sjoin_{how}_{int(time.time() * 1000)}"
    passthrough = (_SENTINEL_TYPE,) if how == "left_outer" else ()
    q = (
        click_purchase_attribution(stream, how=how, passthrough_types=passthrough)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        if how == "left_outer":
            # outer rows need the watermark to close their intervals
            _write_sentinel(raw_schema, stream_dir)
            q.processAllAvailable()
            for _ in range(200):
                wm = (q.lastProgress or {}).get("eventTime", {}).get(
                    "watermark", ""
                )
                if wm >= "2100":
                    break
                time.sleep(0.1)
            else:
                raise TimeoutError("watermark never crossed the sentinel")
        rows = spark.sql(
            f"SELECT * FROM {name} WHERE user_id IS NULL OR user_id >= 0"
        ).collect()
    finally:
        q.stop()
        shutil.rmtree(stream_dir, ignore_errors=True)
    return rows


def _key(r):
    return (
        r["user_id"], r["click_id"], str(r["click_ts"]),
        r["purchase_id"], str(r["purchase_ts"]), r["purchase_value"],
    )


def test_inner_stream_join_matches_batch(spark, sf_dir):
    got = sorted(_key(r) for r in _drive(spark, sf_dir, "inner"))
    e = load_table(spark, sf_dir, "events")
    want = sorted(
        _key(r) for r in click_purchase_attribution_batch(e).collect()
    )
    assert len(got) > 0, "no click->purchase pairs at this SF"
    assert got == want


def test_left_outer_stream_join_matches_batch(spark, sf_dir):
    got = [r for r in _drive(spark, sf_dir, "left_outer")]
    # sentinel click (user_id < 0 filtered by the memory-table query unless
    # null; the sentinel is event_type-less so it never enters the join)
    got_keys = sorted(_key(r) for r in got)
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    inner = click_purchase_attribution_batch(e)
    matched = {r["click_id"] for r in inner.select("click_id").collect()}
    unmatched = [
        (r["user_id"], r["event_id"], str(r["ts"]), None, "None", None)
        for r in clicks.collect()
        if r["event_id"] not in matched
    ]
    want = sorted(
        [_key(r) for r in inner.collect()]
        + [(u, c, t, None, "None", None) for u, c, t, _, _, _ in unmatched]
    )
    assert len(got_keys) == len(want)
    assert got_keys == want


def test_streaming_join_state_is_bounded(spark, sf_dir):
    """The physical plan must be a real stream-stream join with watermark
    state-eviction conditions — not an unconstrained buffer."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream_dir = _stream_source_dir(sf_dir)
    try:
        stream = normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(stream_dir)
        )
        j = click_purchase_attribution(stream)
        plan = j._jdf.queryExecution().analyzed().toString()
        assert "EventTimeWatermark" in plan
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
