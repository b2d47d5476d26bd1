"""Time one registered query via the noop sink (guide §1.4). Usage:
python plans/r18/time_one.py <query_name> [reps] [sf_dir]"""
import sys, time

sys.path.insert(0, "/root/repo")
from hive_serde_schema_gen_spark.registry import all_queries
from hive_serde_schema_gen_spark.session import get_spark

name = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spark = get_spark()
q = all_queries()[name]
# warmup
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
ts = []
for i in range(reps):
    spark.sparkContext.setJobDescription(f"{name} rep{i}")
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts.append(round(time.perf_counter() - t0, 3))
print(f"{name}: min={min(ts)} all={ts}")
