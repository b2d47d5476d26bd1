"""Loader contract: ``load_table(..., "events").ts`` is always TimestampType.

The driver regenerates ``/root/testdata`` between rounds and has already
flipped the physical encoding of ``events.ts`` once (TIMESTAMP(NANOS)
surfaced as int64 → native ``timestamp[us]`` / TIMESTAMP_NTZ), silently
breaking every events consumer.  These tests synthesize tiny parquet files in
BOTH encodings — they do not depend on ``/root/testdata``'s current mood — so
any future flip fails here first, with a pointed message, instead of erring
nine driver queries.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from hive_serde_schema_gen_spark.sources.tables import load_table, normalize_events_ts

# 2024-01-05T12:34:56.789Z in epoch units
_EPOCH_US = 1_704_458_096_789_000


def _write_events(tmp_path, ts_array) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], type=pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize(
    "encoding,ts_array",
    [
        (
            "nanos",
            pa.array([_EPOCH_US * 1000, _EPOCH_US * 1000 + 1_000_000_000],
                     type=pa.timestamp("ns")),
        ),
        (
            "micros_ntz",
            pa.array([_EPOCH_US, _EPOCH_US + 1_000_000],
                     type=pa.timestamp("us")),
        ),
    ],
)
def test_events_ts_is_timestamp_for_any_encoding(spark, tmp_path, encoding, ts_array):
    sf_dir = _write_events(tmp_path, ts_array)
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"events.ts must load as TimestampType under the {encoding} physical "
        f"encoding, got {df.schema['ts'].dataType}; normalize_events_ts needs "
        "a branch for this encoding"
    )
    # Same instants regardless of encoding: unix_millis must resolve (NTZ
    # would reject it) and equal the value the generator wrote.
    from pyspark.sql import functions as F

    millis = sorted(
        r[0] for r in df.select(F.unix_millis("ts")).collect()
    )
    assert millis[0] == _EPOCH_US // 1000
    # downstream arithmetic contract: bigint cast must work too
    df.select(F.col("ts").cast("bigint")).collect()


def test_normalize_passthrough_on_timestamp(spark):
    """Already-LTZ input passes through normalize_events_ts untouched."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.timestamp_micros(F.lit(_EPOCH_US)).alias("ts")
    )
    out = normalize_events_ts(df)
    assert out is df


def test_real_testdata_events_loads(spark, sf_dir):
    """Whatever encoding /root/testdata currently uses must normalize."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.count() > 0
