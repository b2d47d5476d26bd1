"""Stage-break profile of corpus_pipeline (guide §1.4): time each
construction action and the final noop execution separately.

Usage: python plans/r18/profile_corpus.py [sf_dir]
"""
import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.session import get_spark
from hive_serde_schema_gen_spark.sources.tables import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark()


def t(label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:35s} {dt:7.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm the session
load_table(spark, SF, "documents").count()

from hive_serde_schema_gen_spark.operators.clustering import dedup_canonical
from hive_serde_schema_gen_spark.operators.corpus import (
    CONTEXT_LEN, QUALITY_FLOOR,
)
from hive_serde_schema_gen_spark.operators.dedup import (
    keep_first_per_content, minhash_lsh_pairs,
)
from hive_serde_schema_gen_spark.operators.packing import (
    assign_split, chunk_token_stream,
)
from hive_serde_schema_gen_spark.operators.report import corpus_report_rows
from hive_serde_schema_gen_spark.operators.text import quality_features

total0 = time.perf_counter()
d = load_table(spark, SF, "documents")
kept = t("1 kept: quality+keep_first ckpt", lambda: (
    keep_first_per_content(
        quality_features(d).filter(F.col("quality") >= QUALITY_FLOOR)
        .select("doc_id", "text")
    ).localCheckpoint()
))
pairs = t("2 pairs construction (shd ckpt)", lambda: minhash_lsh_pairs(
    spark, SF, hash_fn="md5", docs=kept, sort=False
).select("doc_a", "doc_b"))
canon = t("3 dedup_canonical (CC probe)", lambda: dedup_canonical(kept, pairs))
packed = t("4 chunk_token_stream (local ckpt)", lambda: chunk_token_stream(
    canon, CONTEXT_LEN
))
packed = assign_split(packed, {"train": 0.98, "val": 0.01, "test": 0.01})
manifest = packed.join(canon.select("doc_id", "n_merged"), "doc_id")
t("5 manifest noop (pack tail)", lambda: noop(manifest))
card = t("6 card construction (2 ckpts)", lambda: corpus_report_rows(
    load_table(spark, SF, "documents"), hash_fn="md5"
))
t("7 card noop (raw minhash chain)", lambda: noop(card))
print(f"{'TOTAL':35s} {time.perf_counter()-total0:7.3f}s")

# the registered slot end to end for reference
from hive_serde_schema_gen_spark.registry import all_queries

q = all_queries()["corpus_pipeline"]
t("slot end-to-end (construction+noop)", lambda: noop(q(spark, SF)))
t("slot end-to-end rep2", lambda: noop(q(spark, SF)))
