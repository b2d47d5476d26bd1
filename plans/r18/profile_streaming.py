"""Per-drive profile of streaming_window_counts (guide §1): times the
three stream drives and their internal phases separately.

Usage: python plans/r18/profile_streaming.py [sf_dir]
"""
import sys, time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from hive_serde_schema_gen_spark.session import get_spark

spark = get_spark()
spark.read.parquet(f"{SF}/events.parquet").count()  # warm

import hive_serde_schema_gen_spark.streaming.windows as W

marks = []


def mark(label):
    marks.append((label, time.perf_counter()))


# wrap the internals with timers
_orig_drive = W._drive_and_read
_orig_stateful = W._run_stateful
_orig_attr = W._run_attribution


def drive(*a, **k):
    mark("win_drive_start")
    out = _orig_drive(*a, **k)
    mark("win_drive_end")
    return out


def stateful(*a, **k):
    mark("stateful_start")
    out = _orig_stateful(*a, **k)
    mark("stateful_end")
    return out


def attr(*a, **k):
    mark("attr_start")
    out = _orig_attr(*a, **k)
    mark("attr_end")
    return out


W._drive_and_read = drive
W._run_stateful = stateful
W._run_attribution = attr

for rep in range(2):
    marks.clear()
    t0 = time.perf_counter()
    mark("begin")
    df = W.streaming_window_counts(spark, SF)
    mark("constructed")
    df.write.format("noop").mode("overwrite").save()
    mark("noop_done")
    total = time.perf_counter() - t0
    print(f"--- rep {rep}: total {total:.3f}s")
    prev = t0
    for label, ts in marks:
        print(f"  {label:20s} +{ts - prev:7.3f}s")
        prev = ts
