"""Time one registered query via the noop sink (guide §1.4) against an
arbitrary repo tree — the paired before/after harness for this round.

Usage: python plans/r18/time_one_at.py <repo_root> <query_name> [reps] [sf_dir]
"""
import sys, time

root = sys.argv[1]
name = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

sys.path.insert(0, root)
from hive_serde_schema_gen_spark.registry import all_queries
from hive_serde_schema_gen_spark.session import get_spark

spark = get_spark()
q = all_queries()[name]
# warmup
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
ts = []
import gc
for i in range(reps):
    spark.sparkContext.setJobDescription(f"{name} rep{i}")
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
    gc.collect()
print(f"{name}@{root}: min={min(ts)} all={ts}")
