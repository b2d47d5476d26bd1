"""Distributed training for the hashed-ngram quality classifier — the
fastText-style model LLM pipelines (CCNet, DCLM, FineWeb-Edu) use to rank
web documents by quality.  ``text.classifier_score`` already SERVES a
linear model at full corpus scale; this module closes the loop and FITS
one inside the engine, so the train → score → filter chain never leaves
Spark.

Model: logistic regression over the same representation
``text.hashed_ngram_features`` produces —

    x[d, b] = count of feature-bucket b in doc d / total features in d
    logit(d) = Σ_b w[b] · x[d, b] + bias
    P(quality) = sigmoid(logit)

so trained weights drop straight into ``classifier_score`` (identical
mean-over-occurrences arithmetic).

Training is full-batch gradient descent expressed as DataFrame algebra —
the PageRank iteration pattern (``graph.py``): the feature matrix is
partitioned ONCE on the document key and lineage-cut; each iteration is
two co-partitioned joins + one transpose aggregation; the weight vector
(≤ n_buckets rows, default 2^18 ≈ 2 MB) BROADCASTS, so the big relation
never shuffles on bucket for the forward pass; per-iteration weights are
``localCheckpoint``-ed to keep the DAG flat.  The bias is a synthetic
always-on feature (bucket −1, x = 1.0), which makes its gradient ride the
same aggregation as every other weight — no driver-side scalar loop.

Scale posture (100 TB): full-batch GD costs one corpus pass per
iteration.  The production recipe is train on a deterministic sample
(``curation.stratified_sample`` / ``take_per_stratum`` — quality labels
are cheap to produce on a sample) and serve the fitted weights over the
full corpus with ``classifier_score``, which is a single pass.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .text import hashed_ngram_features

BIAS_BUCKET = -1  # synthetic always-on feature carrying the intercept


def classifier_features(
    docs: DataFrame,
    n_buckets: int = 1 << 18,
    max_ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Normalized training features ``(id, bucket, x)`` with the bias
    feature appended — ``x`` sums to 2.0 per doc (1.0 features + 1.0
    bias).  Zero-feature docs still get the bias row, so they train on
    the intercept instead of silently dropping out."""
    cnt = hashed_ngram_features(docs, n_buckets, max_ngram, id_col, text_col)
    tot = cnt.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    x = cnt.join(tot, id_col).select(
        id_col, "bucket", (F.col("cnt") / F.col("__tot")).alias("x")
    )
    bias_rows = docs.select(
        id_col, F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return x.unionByName(bias_rows)


def train_classifier(
    docs: DataFrame,
    labels: DataFrame,
    n_buckets: int = 1 << 18,
    max_ngram: int = 2,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
) -> DataFrame:
    """Fit the logistic model; returns the weight table ``(bucket, w)``
    including the intercept at ``bucket = -1``.  ``labels``: (id, y) with
    y ∈ {0.0, 1.0}.

    Update (plain GD, step ``lr``):
        err[d]  = sigmoid(Σ_b w[b]·x[d,b]) − y[d]
        grad[b] = Σ_d err[d]·x[d,b] / N  +  l2·w[b]   (bias never decayed)
        w[b]   −= lr · grad[b]

    Use :func:`split_weights` to feed the result to
    ``text.classifier_score``."""
    feats = (
        classifier_features(docs, n_buckets, max_ngram, id_col, text_col)
        .repartition(id_col)
        .localCheckpoint()
    )
    lab = labels.select(
        id_col, F.col(label_col).cast("double").alias("__y")
    ).repartition(id_col).localCheckpoint()
    n = lab.count()  # bounded driver scalar: one count, reused every iter
    if n == 0:
        raise ValueError("no labeled documents")

    weights = (
        feats.select("bucket").distinct()
        .select("bucket", F.lit(0.0).alias("w"))
        .localCheckpoint()
    )
    for _ in range(iters):
        err = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("__logit"))
            .join(lab, id_col)
            .select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__logit")))
                    - F.col("__y")
                ).alias("__err"),
            )
        )
        grad = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("__err")) / F.lit(float(n))).alias("__g"))
        )
        decay = F.when(
            F.col("bucket") == BIAS_BUCKET, F.lit(0.0)
        ).otherwise(F.lit(float(l2)) * F.col("w"))
        weights = (
            weights.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w")
                    - F.lit(float(lr))
                    * (F.coalesce(F.col("__g"), F.lit(0.0)) + decay)
                ).alias("w"),
            )
            .localCheckpoint()  # cut per iteration — no 2^k DAG
        )
    return weights


def split_weights(weights: DataFrame):
    """``(feature_weights_df, bias)`` in the shape ``classifier_score``
    takes — the single collect is the 1-row intercept."""
    bias_rows = weights.filter(F.col("bucket") == BIAS_BUCKET).collect()
    bias = bias_rows[0]["w"] if bias_rows else 0.0
    return weights.filter(F.col("bucket") != BIAS_BUCKET), float(bias)


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    score_docs: Optional[DataFrame] = None,
    n_buckets: int = 1 << 18,
    max_ngram: int = 2,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
) -> DataFrame:
    """The composed production chain: fit on ``docs``+``labels`` (a
    labeled SAMPLE at cluster scale), score ``score_docs`` (default: the
    training docs) with ``classifier_score`` — one full-corpus pass."""
    from .text import classifier_score

    w = train_classifier(
        docs, labels, n_buckets, max_ngram, iters, lr, l2,
        id_col, text_col, label_col,
    )
    fw, bias = split_weights(w)
    target = docs if score_docs is None else score_docs
    return classifier_score(
        target, fw, bias=bias, n_buckets=n_buckets, max_ngram=max_ngram,
        id_col=id_col, text_col=text_col,
    )
