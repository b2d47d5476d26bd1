"""Corpus report — the dataset-card statistics sheet assembled from the
operators that already exist: size/quality/language/domain/dedup-rate
numbers a data release publishes (public convention: dataset cards /
datasheets for datasets).  Composition only; each section documents which
operator computes it, so the report's scale posture is the union of
theirs.

Cost control: every section is a bounded aggregate or a driver-bounded
top-k; the near-dup rate — the one genuinely corpus-quadratic-looking
number — reuses the banded-LSH path (linear in docs + candidates).  The
whole report runs a handful of jobs and returns a plain dict, safe to log
per release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_report(
    docs: DataFrame,
    top_domains: int = 5,
    near_dup: bool = True,
) -> dict:
    """Statistics sheet for a (doc_id, text[, lang, source]) corpus."""
    from .curation import domain_stats, repetition_stats
    from .diagnostics import column_profile
    from .text import quality_features

    cols = set(docs.columns)
    # ~8 independent jobs consume this frame — cut lineage ONCE so a
    # derived input (curate_and_prepare output, the natural datasheet
    # subject) doesn't re-run its whole pipeline per section (the same
    # multi-consumer convention as quality_gate / minhash_lsh_pairs)
    docs = docs.localCheckpoint()
    out: dict = {}

    # size + length envelope (one-pass profiler; strings profile LENGTH)
    prof = {p["column"]: p for p in column_profile(docs, ["doc_id", "text"])}
    out["n_docs"] = prof["doc_id"]["rows"]
    out["text_len"] = {
        k: prof["text"][k] for k in ("min", "max", "mean", "p50", "p95")
    }
    out["null_text_frac"] = prof["text"]["null_frac"]

    # quality distribution (shared heuristic scorer — pure projection)
    q = quality_features(docs).agg(
        F.avg("quality").alias("mean"),
        F.expr("percentile_approx(quality, 0.5)").alias("p50"),
        F.avg((F.col("quality") < 0.3).cast("double")).alias("frac_low"),
    ).collect()[0]
    out["quality"] = {k: q[k] for k in ("mean", "p50", "frac_low")}

    # composition mixes — TOP-50 strata only (TakeOrdered, driver-bounded:
    # provenance columns can be arbitrarily high-cardinality; an unbounded
    # collect here would be the one driver-OOM hole in the report)
    for c in ("lang", "source"):
        if c in cols:
            top = (
                docs.groupBy(c)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), c)
                .limit(51)
                .collect()
            )
            out[f"{c}_mix"] = {r[c]: r["n"] for r in top[:50]}
            out[f"{c}_mix_truncated"] = len(top) > 50

    # exact-dup rate: ONE map-side-combined aggregate over digests (no
    # window sort — we need the unique count, not the surviving rows)
    n_unique = docs.agg(
        F.countDistinct(
            F.coalesce(  # NULL text is one content class, not zero
                F.md5(F.col("text").cast("binary")), F.lit("__NULL_TEXT__")
            )
        )
    ).collect()[0][0]
    out["exact_dup_frac"] = 1.0 - n_unique / out["n_docs"] if out["n_docs"] else 0.0
    if near_dup:
        from .dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            docs.sparkSession, None, hash_fn="xxhash64", docs=docs, sort=False
        )
        flagged = pairs.select(
            F.col("doc_b").alias("doc_id")
        ).distinct().count()
        out["near_dup_frac"] = flagged / out["n_docs"] if out["n_docs"] else 0.0

    # intra-doc repetition (Gopher-style template smell)
    rep = repetition_stats(docs).agg(
        F.avg("dup_gram_frac").alias("mean_dup_gram_frac"),
        F.avg((F.col("dup_gram_frac") > 0.3).cast("double")).alias(
            "frac_templatey"
        ),
    ).collect()[0]
    out["repetition"] = {k: rep[k] for k in rep.__fields__}

    # domain head (URL extraction; empty for URL-free corpora)
    out["top_domains"] = [
        (r["domain"], r["n_urls"])
        for r in domain_stats(docs).limit(top_domains).collect()
    ]
    return out
