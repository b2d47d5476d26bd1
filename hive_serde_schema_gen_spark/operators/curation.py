"""Corpus-curation operators a pretraining-data pipeline needs beyond
dedup: benchmark decontamination (n-gram overlap against an eval set) and
PII redaction.  Both are pure built-in-expression pipelines — no Python row
path — and both sides of every join are shaped for the 100 TB case (the
benchmark side broadcasts; the corpus side streams through one explode +
one hash join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_ngrams(
    d: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """Distinct word n-grams per document, shuffle-free until the distinct
    (the ``arrays_zip`` + shifted-slices formulation of
    ``dedup.shingles_df_no_shuffle``, parameterized over n).  ``hashed``
    replaces the gram string with xxhash64 — an 8-byte join payload instead
    of a ~50-byte string, the production configuration (a 2⁻⁶⁴ collision
    can only add one spurious shared gram)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    z = F.arrays_zip(
        words.alias("t0"),
        *[
            F.slice(
                words, i + 1, F.greatest(F.size(words) - i, F.lit(0))
            ).alias(f"t{i}")
            for i in range(1, n)
        ],
    )
    kept = d.select(id_col, F.explode(z).alias("s")).filter(
        F.col(f"s.t{n - 1}").isNotNull()
    )
    gram = F.concat_ws(" ", *[f"s.t{i}" for i in range(n)])
    return kept.select(
        F.col(id_col),
        (F.xxhash64(gram) if hashed else gram).alias("gram"),
    ).distinct()


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Benchmark decontamination: for every (document, benchmark item) pair
    sharing at least one word n-gram, the shared-gram count and the
    fraction of the benchmark item's grams found in the document — the
    standard eval-set-leakage statistic (long verbatim n-grams, n≈8+,
    essentially never collide by chance in natural text).

    Scale shape: the corpus side is one explode + distinct; the benchmark
    side (thousands of items vs billions of documents) broadcasts, so the
    join is map-side — the corpus never shuffles on gram.  Aggregation is
    per (doc, bench) pair, map-side combined.  A downstream pipeline drops
    or flags docs with ``frac_bench_matched`` above a threshold.

    Returns (doc_id, bench_id, n_shared, bench_grams, frac_bench_matched),
    one row per contaminated pair."""
    dg = word_ngrams(docs, n)
    bg = word_ngrams(benchmark, n, id_col=bench_id_col)
    bench_sizes = bg.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    shared = (
        dg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id", bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.join(F.broadcast(bench_sizes), bench_id_col).select(
        "doc_id",
        bench_id_col,
        "n_shared",
        "bench_grams",
        (F.col("n_shared") / F.col("bench_grams")).alias(
            "frac_bench_matched"
        ),
    )


# (pattern, replacement) — ordered: the more specific pattern first so an
# email is redacted as EMAIL, not as a phone-ish digit run inside it.
_PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b(?:\d[ -]?){13,16}\d\b", "<CARD>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(
    d: DataFrame, text_col: str = "text", with_counts: bool = True
) -> DataFrame:
    """Regex PII redaction over a text column: emails, SSN-shaped ids,
    payment-card-shaped digit runs, phone numbers, IPv4 addresses — each
    replaced by a typed placeholder, applied most-specific-first so one
    span is classified once.  Heuristic by design (a determined format
    evades any regex); the point is the Spark shape: a narrow per-row
    ``regexp_replace`` chain, fully codegen'd, zero shuffles — at 100 TB
    this runs at scan speed.  ``with_counts`` adds per-category match
    counts (via ``regexp_count`` on the PRE-redaction text) so a pipeline
    can route high-PII documents to quarantine instead of just scrubbing
    them."""
    out = d
    if with_counts:
        for name, pat, _ in _PII_RULES:
            out = out.withColumn(
                f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
            )
    redacted = F.col(text_col)
    for _, pat, repl in _PII_RULES:
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.withColumn(text_col, redacted)
