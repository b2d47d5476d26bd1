"""Hot-shingle df-cap properties (``cap_shingles`` / ``max_df=``):

- the shared-shingle CANDIDATE set shrinks monotonically as the cap
  tightens — capping can only remove candidates, never add them (the
  banding/threshold stages downstream are computed on the capped universe,
  so their outputs are exact for that universe, not subsets of the uncapped
  output — the monotone claim is about candidate generation, where the
  skew lives);
- ``max_df = 1.0`` is a no-op (no shingle can exceed 100% df);
- the capped universe really has no shingle above the df limit;
- the capped LSH pipeline still emits only pairs meeting the exact Jaccard
  threshold (on the capped universe).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    cap_shingles,
    minhash_lsh_pairs,
    shingles_df,
)
from hive_serde_schema_gen_spark.sources.tables import load_table


def _candidates(shd):
    x, y = shd.alias("x"), shd.alias("y")
    rows = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
        .collect()
    )
    return {(r["a"], r["b"]) for r in rows}


@pytest.fixture(scope="module")
def shd_and_n(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return shingles_df(d).cache(), d.count()


def test_cap_only_removes_candidates(shd_and_n):
    shd, n = shd_and_n
    base = _candidates(shd)
    prev = base
    for max_df in (0.5, 0.1, 0.02):
        capped = _candidates(cap_shingles(shd, n, max_df))
        assert capped <= base, f"max_df={max_df} added candidate pairs"
        assert capped <= prev, f"tightening to {max_df} added candidate pairs"
        prev = capped


def test_cap_is_noop_at_full_df(shd_and_n):
    shd, n = shd_and_n
    assert cap_shingles(shd, n, 1.0).count() == shd.count()


def test_cap_removes_all_hot_shingles(shd_and_n):
    shd, n = shd_and_n
    max_df = 0.02
    limit = int(max_df * n)
    over = (
        cap_shingles(shd, n, max_df)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > limit)
        .count()
    )
    assert over == 0


def test_capped_lsh_pairs_meet_threshold(spark, sf_dir):
    rows = minhash_lsh_pairs(spark, sf_dir, max_df=0.05).collect()
    assert all(r["jaccard"] >= JACCARD_THRESHOLD for r in rows)


def test_shuffle_free_shingles_equal_window_shingles(spark, sf_dir):
    """The arrays_zip formulation must emit exactly the window formulation's
    rows (both hashed and string modes) and its plan must contain no window
    Exchange before the distinct."""
    from hive_serde_schema_gen_spark.operators.dedup import (
        shingles_df,
        shingles_df_no_shuffle,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    for hashed in (False, True):
        a = sorted(map(tuple, shingles_df(d, hashed=hashed).collect()))
        b = sorted(map(tuple, shingles_df_no_shuffle(d, hashed=hashed).collect()))
        assert a == b
    plan = (
        shingles_df_no_shuffle(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
