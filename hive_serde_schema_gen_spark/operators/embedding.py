"""Deterministic hashed text embeddings — the engine-side featurizer that
lets the WHOLE embedding-space stack (``semantic_dedup``, ANN, SemDeDup,
``semantic_contamination``, JL projection) run on corpora that ship no
``embeddings`` table: a feature-hashing bag-of-ngrams vector (the public
"hashing trick" of Weinberger et al. / fastText's bucket hashing), pure
built-in expressions end to end.

This is NOT a learned model and does not pretend to be one: hashed
sparse vectors capture token-overlap similarity (a near-duplicate or
light paraphrase embeds close because it shares most token mass), not
deep semantics.  That is exactly the signal lexical near-dup stacks use
— and the plumbing (column contract, normalization, determinism) is
identical to what a real encoder would feed, so swapping in model
vectors later changes no downstream operator.  A real model inference
stage would be a ``mapInPandas`` batch over the text column — the same
Arrow shape as ``multimodal._bmp_decode`` — and is deliberately out of
scope here (no model runtimes in this environment).

Scale shape: explode tokens (+ optional bigrams) → xxhash64 slot/sign →
ONE map-side-combined (doc, slot) sum → one per-doc array assembly →
per-row L2 normalization.  Everything is codegen'd; the only shuffles
are the two doc-keyed aggregates; cost is O(tokens), embarrassingly
parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _tokens


def embed_text(
    d: DataFrame,
    dim: int = 64,
    bigrams: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "embed-v1",
) -> DataFrame:
    """(id, embedding array<double>): L2-normalized hashed bag-of-ngrams.

    Each token (and, with ``bigrams``, each adjacent token pair) hashes
    to a slot ``xxhash64(salt, gram) mod dim`` with a ±1 sign from an
    independent hash (signed hashing keeps collisions unbiased — the
    standard feature-hashing construction).  Empty/whitespace-only texts
    yield the zero vector (callers' zero-norm guards — e.g. the PQ
    scorer's — already handle it).  Deterministic: a pure function of
    (salt, text), identical across runs, partitionings, and retries."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = _tokens(F.lower(F.col(text_col)))
    grams = F.concat(
        toks,
        F.when(
            F.lit(bigrams) & (F.size(toks) > 1),
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    g = d.select(F.col(id_col).alias("__id"), F.explode(grams).alias("__g"))
    slot = F.pmod(F.xxhash64(F.lit(salt), F.col("__g")), F.lit(dim)).cast("int")
    sign = (
        F.pmod(F.xxhash64(F.lit(salt + ":sign"), F.col("__g")), F.lit(2)) * 2 - 1
    ).cast("double")
    sums = (
        g.select("__id", slot.alias("__s"), sign.alias("__v"))
        .groupBy("__id", "__s")
        .agg(F.sum("__v").alias("__w"))
    )
    vec = (
        sums.groupBy("__id")
        .agg(F.map_from_entries(F.collect_list(F.struct("__s", "__w"))).alias("__m"))
        .select(
            "__id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                # element_at on a MAP keys directly (slot ints, not 1-based)
                lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
            ).alias("__raw"),
        )
    )
    norm = F.sqrt(
        F.aggregate("__raw", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.when(norm > 0, F.transform("__raw", lambda x: x / norm)).otherwise(
        F.col("__raw")
    )
    out = vec.select(F.col("__id").alias(id_col), unit.alias("embedding"))
    # docs with NO grams (empty text) have no sums rows — left join them
    # back with the zero vector so every input id gets an embedding
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0.0))
    return (
        d.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("embedding", zeros).alias("embedding"),
        )
    )
