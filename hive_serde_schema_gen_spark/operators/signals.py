"""Per-document quality-signal bundle — the RedPajama-V2 "quality
signals" release shape: instead of filtering during curation, compute
EVERY signal once, persist the wide frame next to the corpus, and let
each downstream consumer pick its own thresholds (re-filtering a 100 TB
corpus costs a full pass; re-thresholding a signal table costs a scan
of the table).

Composes the engine's existing per-document signals into one frame:

- heuristic quality features (``text.quality_features`` — length,
  punctuation density, stopword ratio, composite score),
- stopword-profile language prediction (the ``text_lang_id`` argmax),
- intra-document repetition (``curation.repetition_stats`` — the
  Gopher-style duplicate-gram fractions),
- opt-in: hashed-ngram classifier score (``text.classifier_score``)
  and bigram-LM perplexity (``lm.lm_score``).

Scale shape: the heuristic + language columns are ONE narrow projection
(tokenize once, zero shuffle); repetition, classifier, and perplexity
each add one doc-keyed map-side-combined aggregate; the final assembly
is doc_id-keyed left joins that co-partition on the same key at scale.
Persist the output with ``sources.sinks.write_curated`` partitioned the
same way as the corpus so signal lookups prune with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .curation import repetition_stats
from .text import LANG_PROFILES, _tokens, quality_features


def _lang_prediction(toks) -> F.Column:
    """Stopword-profile argmax with the fixed en>de>fr>es>zh tie-break —
    the same decision rule as the ``text_quality_lang`` slot."""
    s = {
        lg: F.size(
            F.filter(toks, (lambda words: lambda t: t.isin(*words))(
                LANG_PROFILES[lg]
            ))
        )
        for lg in ("en", "de", "fr", "es", "zh")
    }
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"])
            & (s["en"] >= s["es"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] >= s["zh"]), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["zh"]), "fr")
        .when(s["es"] >= s["zh"], "es")
        .otherwise("zh")
    )


def quality_signals(
    d: DataFrame,
    repetition_n: int = 3,
    classifier_weights: dict | None = None,
    classifier_bias: float = 0.0,
    lm_model=None,
    with_ppl: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One wide row per document: every quality signal the engine
    computes, ready to persist as the corpus's signal table.

    Columns: ``n_chars  n_tokens  n_punct  n_stopwords  quality
    pred_lang  rep_n_grams  dup_gram_frac  top_gram_frac`` plus
    ``clf_score`` when ``classifier_weights`` is given and
    ``ppl``/``avg_nll`` when ``with_ppl`` (``lm_model``: prefit
    ``lm.train_bigram_lm`` triple, ``None`` self-trains).

    No filtering happens here — thresholding is the consumer's choice;
    ``corpus.curate_and_prepare`` remains the filtering front-end."""
    base = quality_features(d.select(id_col, text_col)).select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_punct",
        "n_stopwords",
        "quality",
        _lang_prediction(_tokens(text_col)).alias("pred_lang"),
    )
    rep = repetition_stats(
        d, n=repetition_n, id_col=id_col, text_col=text_col
    ).select(
        id_col,
        F.col("n_grams").alias("rep_n_grams"),
        "dup_gram_frac",
        "top_gram_frac",
    )
    out = base.join(rep, id_col, "left")
    if classifier_weights is not None:
        from .text import classifier_score

        clf = classifier_score(
            d, classifier_weights, bias=classifier_bias,
            id_col=id_col, text_col=text_col,
        ).select(id_col, F.col("score").alias("clf_score"))
        out = out.join(clf, id_col, "left")
    if with_ppl:
        from .lm import lm_score

        ppl = lm_score(d, model=lm_model, id_col=id_col, text_col=text_col)
        out = out.join(
            ppl.select(id_col, "avg_nll", "ppl"), id_col, "left"
        )
    return out
