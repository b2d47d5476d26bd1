"""End-to-end training-corpus preparation — the composition the individual
operators exist for (the RefinedWeb/SlimPajama-shaped pipeline):

    quality filter → exact dedup (keep first per content)
    → near-dup pairs (MinHash+LSH, production config, optional df-cap)
    → connected-components canonicalization
    → token-stream packing → deterministic train/val/test splits

One call returns every surviving document with its corpus offset, context-
window chunk range, split assignment, and dedup lineage (``n_merged``).

Scale posture is inherited from the stages (each documented in its own
module): digest-grouped exact dedup, banded near-dup candidates (never
all-pairs), O(log n)-round components with per-round lineage cuts,
distributed prefix-sum packing, pure-per-row split assignment.  Nothing in
the composition adds a driver-side loop or an unbounded shuffle: the glue
is two broadcast-sized joins (quality scores are per-doc aggregates;
survivor/lineage sets are near-dup-cluster-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.tables import load_table
from .clustering import dedup_canonical
from .dedup import minhash_lsh_pairs
from .packing import assign_split, chunk_token_stream
from .text import text_quality_score

DEFAULT_FRACTIONS = {"train": 0.98, "val": 0.01, "test": 0.01}


def prepare_training_corpus(
    spark,
    sf_dir: str,
    *,
    context_len: int = 512,
    fractions: dict[str, float] | None = None,
    quality_floor: float = 0.3,
    hash_fn: str = "xxhash64",
    max_df: float | None = None,
) -> DataFrame:
    """documents → training-ready corpus manifest.

    Output columns: (doc_id, n_tokens, offset, chunk_first, chunk_last,
    n_chunks, split, n_merged) — one row per SURVIVING document, in corpus
    (doc_id) order.  ``n_merged`` counts the near-dups this survivor
    absorbed (0 = unique).

    Deterministic end to end: the quality gate is per-row arithmetic, both
    dedup stages keep min(doc_id), packing offsets depend only on doc_id
    order, and splits are md5-mod functions of the id — re-running on the
    same corpus (or any repartitioning of it) reproduces the manifest
    bit-for-bit (asserted in tests/test_corpus.py).
    """
    fractions = fractions or DEFAULT_FRACTIONS
    d = load_table(spark, sf_dir, "documents")

    # 1. quality gate (per-doc heuristic score; see text_quality_score)
    scores = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    kept = d.join(
        scores.filter(F.col("quality") >= quality_floor), "doc_id"
    )

    # 2. exact dedup, keep-first per content digest
    w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    kept = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 3. near-dup pairs on the survivors → components → canonical docs
    pairs = minhash_lsh_pairs(
        spark, sf_dir, hash_fn=hash_fn, max_df=max_df, docs=kept
    ).select("doc_a", "doc_b")
    canon = dedup_canonical(kept, pairs)

    # 4. pack the canonical corpus into context windows + assign splits
    packed = chunk_token_stream(canon, context_len)
    packed = assign_split(packed, fractions)
    return packed.join(
        canon.select("doc_id", "n_merged"), "doc_id"
    ).orderBy("doc_id")
