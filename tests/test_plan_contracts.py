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
    "similarity_brute",  # r10 merge: carries similarity_pairs_threshold
    "text_bm25",  # 1-row corpus-stats broadcast (N, avgdl)
    "bm25_topk_indexed",  # same 1-row stats broadcast, from the index
    "ann_topk_ivf_pq",  # shares similarity_ivf_topk's probe shape
    "hybrid_topk",  # composes bm25's stats broadcast + the ANN probe shape
    "lm_perplexity",  # 1-row vocabulary-size broadcast (V)
    # broadcast benchmark crossJoin (exact decontamination) + the DSIR
    # branches' 1-row model-total broadcasts
    "curation_ops",
    # the Platt-calibration branch scores the held-out slice against the
    # 1-row broadcast (a, b) parameter frame (logreg.calibrate_classifier)
    "text_quality_lang",
}


# Sanctioned GLOBAL (unpartitioned) window nodes: each runs over a frame
# whose row count is bounded by something other than the data size — a
# LIMIT k, a per-shard aggregate, a GROUP BY over a tiny domain — with the
# bound stated in an in-code comment at the window site.  A global window
# over a row-count-scaled frame is the one banned shape (it serializes the
# whole input through a single partition at 100 TB); round 11's
# sketch-median was exactly that and is gone (sketches.py now derives the
# exact median from a value-domain histogram).
_GLOBAL_WINDOW_OK = {
    # DSIR Gumbel top-k: sel_rank window runs over exactly k rows, AFTER
    # TakeOrderedAndProject .limit(k) (dsir.py:286)
    "curation_ops",
    # prefix-sum chunking: running sum over per-SHARD totals — O(#shards)
    # rows, not O(docs) (packing.py:115).  web_corpus_from_crawl's copy of
    # this window sits behind a localCheckpoint lineage cut, so it does
    # not appear in that final plan — and round 17's digest layer put
    # packing_ops behind the same cut (the window still runs, inside the
    # checkpointed segment); both dropped from the sanction set (the
    # stale-sanction test below enforces exactly that).
    "corpus_pipeline",
    # share-of-total OVER () on a pre-aggregated o_orderstatus frame
    # (3 rows; relational.py window_share_of_total)
    "window_analytics",
    # frequent_items rank over Misra-Gries candidates, post-limit(k)
    # (diagnostics.py:66)
    "stats_summary",
    # hybrid_topk's rrf_fuse ranks (bounded by top-k) are likewise behind
    # a checkpoint cut now — not sanctioned while invisible to the scan.
}


def _global_windows(plan: str):
    """Window nodes with no partition spec, from the formatted plan.

    A Window node's `Arguments:` line carries bracket groups
    `[exprs], [partitionSpec], [orderSpec]`; the partition group is
    omitted when empty, so 3 groups = partitioned (fine), 2 groups whose
    second is an ORDER spec (` ASC`/` DESC`) = global ordered window,
    1 group = global empty-frame window."""
    hits = []
    for line in plan.splitlines():
        s = line.strip()
        if not s.startswith("Arguments:") or "windowspecdefinition" not in s:
            continue
        groups = s.count("], [") + 1
        if groups >= 3:
            continue
        if groups == 1:
            hits.append(s[:160])
            continue
        second = s.rsplit("], [", 1)[-1]
        if " ASC" in second or " DESC" in second:
            hits.append(s[:160])
    return hits


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


def test_no_global_windows_outside_sanctioned(plans):
    """No registered plan may sort its whole input through one partition
    via an unpartitioned window, except the documented bounded-frame
    cases in _GLOBAL_WINDOW_OK (each bounded by a LIMIT or a tiny-domain
    aggregate, never by row count)."""
    bad = {
        n: gw
        for n, p in plans.items()
        if (gw := _global_windows(p)) and n not in _GLOBAL_WINDOW_OK
    }
    assert not bad, f"global unpartitioned window in: {bad}"


def test_global_window_sanctions_not_stale(plans):
    """Every sanctioned name still HAS a global window — a stale sanction
    is an invitation to silently reintroduce one elsewhere."""
    stale = [
        n
        for n in sorted(_GLOBAL_WINDOW_OK)
        if n in plans and not _global_windows(plans[n])
    ]
    assert not stale, f"sanctioned but window-free (remove from set): {stale}"


def test_parquet_scans_prune_columns(plans):
    """Every parquet scan must carry a ReadSchema (column pruning reached
    the source) — a scan materializing all columns for a narrow query is
    the classic silent 100-TB regression."""
    for name, p in plans.items():
        if "Scan parquet" in p:
            assert "ReadSchema" in p, f"{name}: parquet scan without ReadSchema"


def test_round8_library_operators_stay_jvm_side(spark, sf_dir):
    """The round-8 library surface (not in the 50-slot registry) holds the
    same plan contracts as the registered queries: no Python eval in the
    default paths (only the OPT-IN full-entity decode and the WET byte
    walk are Arrow passes, by design), no cartesian products."""
    from hive_serde_schema_gen_spark.operators.curation import filter_by_domain
    from hive_serde_schema_gen_spark.operators.embedding import embed_text
    from hive_serde_schema_gen_spark.operators.html import html_to_text
    from hive_serde_schema_gen_spark.operators.packing import epoch_shuffle
    from hive_serde_schema_gen_spark.plans import assert_no_python_udf
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    frames = {
        "html_to_text": html_to_text(d),
        "embed_text": embed_text(d),
        "filter_by_domain": filter_by_domain(
            d, allow=["src1", "src2"], deny=["src3"]
        ),
        "epoch_shuffle": epoch_shuffle(d, epoch=2, n_shards=4),
    }
    for name, df in frames.items():
        assert_no_python_udf(df)
        assert "CartesianProduct" not in explain_str(df), name
