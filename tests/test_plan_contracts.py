"""Plan contracts for EVERY registered query: scale-killer nodes must
never appear.  This is the drift guard — a Spark upgrade, a loader tweak,
or an innocent refactor that flips a broadcast into a cartesian or pulls
a Python eval into a relational path fails HERE, not in a 100-TB run.

(Targeted per-query plan assertions live in test_plans.py; this sweep is
the blanket invariant over the whole registry.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from hive_serde_schema_gen_spark.plans.explain import explain_str

# multimodal queries run Arrow-batched mapInPandas BY DESIGN (binary
# decode); everything else must stay JVM-side
_ARROW_OK = {q for q in entry.queries() if q.startswith("multimodal")}

# sanctioned nested-loop joins: 1-row broadcasts (corpus counts, probe
# vectors) and the deliberately-quadratic exact baseline whose docstring
# bounds it to an id range (the LSH query is its scale path)
_NESTED_LOOP_OK = {
    "text_tfidf_top_terms",
    "similarity_ivf_topk",
    "similarity_lsh_bucketed",
    "stats_summary",
    "similarity_pairs_threshold",
    "text_bm25",  # 1-row corpus-stats broadcast (N, avgdl)
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, fn in entry.queries().items():
        out[name] = explain_str(fn(spark, sf_dir))
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian product in: {bad}"


def test_no_python_eval_outside_multimodal(plans):
    bad = [
        n
        for n, p in plans.items()
        if n not in _ARROW_OK
        and ("BatchEvalPython" in p or "ArrowEvalPython" in p)
    ]
    assert not bad, f"python eval in relational path: {bad}"


def test_nested_loop_joins_only_where_sanctioned(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in _NESTED_LOOP_OK
    ]
    assert not bad, f"unsanctioned nested-loop join in: {bad}"


def test_parquet_scans_prune_columns(plans):
    """Every parquet scan must carry a ReadSchema (column pruning reached
    the source) — a scan materializing all columns for a narrow query is
    the classic silent 100-TB regression."""
    for name, p in plans.items():
        if "Scan parquet" in p:
            assert "ReadSchema" in p, f"{name}: parquet scan without ReadSchema"
