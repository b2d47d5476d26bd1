"""Fine-grained phase profile of the attribution + window drives."""
import sys, time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.session import get_spark

spark = get_spark()
spark.read.parquet(f"{SF}/events.parquet").count()

import hive_serde_schema_gen_spark.streaming.windows as W
from hive_serde_schema_gen_spark.sources.tables import normalize_events_ts
from hive_serde_schema_gen_spark.streaming.join import (
    click_purchase_attribution,
)

spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
raw_schema = spark.read.parquet(f"{SF}/events.parquet").schema


def phase(label, t0):
    t1 = time.perf_counter()
    print(f"  {label:28s} +{t1 - t0:7.3f}s")
    return t1


for rep in range(2):
    print(f"--- attr rep {rep}")
    stream_dir = W._stream_source_dir(SF)
    W._write_sentinel(raw_schema, stream_dir)
    t = time.perf_counter()
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(stream_dir)
    )
    name = f"prof_attr_{rep}_{int(time.time() * 1000)}"
    q = (
        click_purchase_attribution(
            stream, how="left_outer", passthrough_types=(W._SENTINEL_TYPE,)
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    t = phase("start()", t)
    q.processAllAvailable()
    t = phase("processAllAvailable", t)
    n_polls = 0
    for _ in range(200):
        wm = (q.lastProgress or {}).get("eventTime", {}).get("watermark", "")
        if wm >= "2100":
            break
        n_polls += 1
        time.sleep(0.1)
    t = phase(f"wm poll loop ({n_polls} polls)", t)
    rows = spark.sql(f"SELECT COUNT(*) FROM {name} WHERE user_id >= 0").collect()
    t = phase("result collect", t)
    q.stop()
    t = phase("stop()", t)
    import shutil

    shutil.rmtree(stream_dir, ignore_errors=True)

# window drive phases
from hive_serde_schema_gen_spark.streaming.exactly_once import (
    idempotent_epoch_sink, read_committed,
)
import tempfile, shutil

for rep in range(2):
    print(f"--- window rep {rep}")
    stream_dir = W._stream_source_dir(SF)
    t = time.perf_counter()
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(stream_dir)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )
    out_dir = tempfile.mkdtemp(prefix="prof_eo_win_")
    inner = idempotent_epoch_sink(out_dir)

    def handler(batch_df, epoch_id):
        inner(batch_df, epoch_id)
        inner(batch_df, epoch_id)

    q = agg.writeStream.outputMode("append").foreachBatch(handler).start()
    t = phase("start()", t)
    q.processAllAvailable()
    t = phase("processAllAvailable 1", t)
    W._write_sentinel(raw_schema, stream_dir)
    t = phase("write sentinel", t)
    q.processAllAvailable()
    t = phase("processAllAvailable 2", t)
    n_polls = 0
    for _ in range(200):
        p = q.lastProgress
        wm = (p or {}).get("eventTime", {}).get("watermark", "")
        if wm >= "2100":
            break
        n_polls += 1
        time.sleep(0.1)
    t = phase(f"wm poll loop ({n_polls} polls)", t)
    q.stop()
    t = phase("stop()", t)
    committed = read_committed(spark, out_dir)
    n = committed.count() if committed is not None else 0
    t = phase(f"read_committed ({n} rows)", t)
    shutil.rmtree(stream_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
