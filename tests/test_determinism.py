"""Partition-independence: the determinism rules (decimal money math,
integer quantization) must make results bit-identical when the shuffle
layout changes — the property that keeps a 100 TB job's output stable
across cluster sizes and AQE decisions."""

import pytest

from hive_serde_schema_gen_spark.registry import all_queries

QUERIES = all_queries()

SENSITIVE = [
    "q1_pricing_summary",  # grouped decimal sums
    "q5_local_supplier",  # join + grouped sums
    "window_running_lag",  # windowed decimal sums
    "similarity_topk_cosine",  # quantized dot products
    "dedup_minhash_lsh",  # hash-derived signatures
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_identical_across_shuffle_layouts(name, spark, sf_dir):
    def run():
        return sorted(tuple(str(v) for v in r) for r in QUERIES[name](spark, sf_dir).collect())

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    a = run()
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b, f"{name}: results drift with shuffle layout"
