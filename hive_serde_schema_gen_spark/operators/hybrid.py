"""Hybrid retrieval serve path — the single entry point the BM25-index
and ANN docstrings defer to: lexical top-k from the PERSISTED BM25
postings index (``text_index.bm25_topk_indexed``), semantic top-k from
the LSH+PQ ANN path (``similarity.ann_topk_lsh_pq``), fused score-free
with reciprocal-rank fusion (``text.rrf_fuse``).

Why both: BM25 retrieves documents containing the query's (possibly
rare) TERMS but is blind to paraphrases that use none of them; embedding
ANN retrieves token-distribution neighbors but dilutes a couple of rare
must-match terms in the overall mass.  RRF fuses the two rankings on
ranks alone (the scales are incomparable), so a document surfaced by
EITHER retriever outranks one surfaced by neither — the standard hybrid
recall win, demonstrated on a planted keyword+paraphrase corpus in
tests/test_hybrid.py.

Query contract (query-by-example): the query is (a) a term string for
the lexical side and (b) a vector already present in the embedding
frame under ``query_vec_id`` — the shape of "find documents related to
THIS one".  For free-text queries, embed the query text with
``embedding.embed_text`` (same salt/dim as the corpus) and union the
1-row result in under a reserved id; the hashing featurizer is a pure
function, so the query embeds identically to a corpus doc.

Serve-path cost at 100 TB: the BM25 side reads only the query terms'
postings row groups from the compacted index; the ANN side reads the
Hamming-ball buckets' PQ codes plus k×4 full vectors; the fuse is a
union of two k-row lists.  Nothing scans the corpus.  Pass
``lsh_index=build_lsh_index(e)`` / ``pq=build_pq_index(e)`` to amortize
the ANN ingest artifacts across queries, exactly like the BM25 index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import PQ_RERANK_MULT, QUERY_VEC_ID, ann_topk_lsh_pq
from .text import rrf_fuse
from .text_index import bm25_topk_indexed

# Reserved query id for free-text queries — far outside any real doc-id
# space (xxhash64 doc ids are full-range longs, but a corpus id equal to
# this exact value is astronomically unlikely AND checked at call time).
QUERY_TEXT_ID = -(2**62) - 3


def hybrid_topk(
    spark: SparkSession,
    text_index_path: str,
    query: str,
    e: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    k: int = 10,
    rrf_k: int = 60,
    depth_mult: int = 2,
    lsh_index: DataFrame | None = None,
    pq=None,
) -> DataFrame:
    """Top-``k`` (doc_id, rrf) for the hybrid query — see module docstring.

    Each retriever runs at depth ``k × depth_mult`` before fusion (the
    standard over-retrieve: a doc ranked k+1 by both sides can still fuse
    into the top k).  Both inputs arrive ranked; RRF attaches 1-based
    ranks per list and sums ``1/(rrf_k + rank)``."""
    depth = k * depth_mult
    lex = bm25_topk_indexed(spark, text_index_path, query, k=depth)
    sem = ann_topk_lsh_pq(
        e,
        k=depth,
        query_vec_id=query_vec_id,
        index=lsh_index,
        pq=pq,
        rerank_mult=PQ_RERANK_MULT,
    ).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse([lex, sem], k=rrf_k, topk=k)


def hybrid_topk_text(
    spark: SparkSession,
    text_index_path: str,
    query: str,
    e: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    depth_mult: int = 2,
    lsh_index: DataFrame | None = None,
    pq=None,
    embed_salt: str = "embed-v1",
    embed_hash_fn: str = "xxhash64",
    bigrams: bool = True,
    check_reserved: bool = True,
) -> DataFrame:
    """FREE-TEXT hybrid query — no query-by-example doc needed: the query
    string is embedded with the SAME hashing featurizer configuration as
    the corpus (``embedding.embed_text`` is a pure function of
    (salt, text), so the query embeds exactly as a corpus doc would),
    its LSH buckets/quantized vector are computed on the 1-row frame and
    UNIONED into the passed index (the corpus artifact is never rebuilt —
    serve-path cost stays O(query)), and the composition then runs as
    :func:`hybrid_topk` under the reserved ``QUERY_TEXT_ID``.

    Only meaningful when the corpus embeddings came from ``embed_text``
    with the same (dim, salt, hash_fn, bigrams) — pass the corpus
    configuration explicitly for anything non-default.

    ``check_reserved``: the reserved-id collision guard costs one tiny
    Spark job per call — serving tiers looping over queries against a
    corpus they already validated pass ``False`` to skip it (the same
    skip-the-eager-job discipline as ``semantic_contamination``'s
    ``strategy`` flag)."""
    from .embedding import embed_text
    from .similarity import build_lsh_index, build_pq_index, lsh_buckets, quantized

    if check_reserved and e.filter(
        F.col("vec_id") == QUERY_TEXT_ID
    ).limit(1).count():
        raise ValueError(f"corpus contains the reserved id {QUERY_TEXT_ID}")
    dim = len(e.select("embedding").first()["embedding"])
    qdoc = spark.createDataFrame(
        [(QUERY_TEXT_ID, query)], "doc_id long, text string"
    )
    qe = embed_text(
        qdoc, dim=dim, bigrams=bigrams, salt=embed_salt, hash_fn=embed_hash_fn
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    base = lsh_index if lsh_index is not None else build_lsh_index(e)
    qrow = qe.select("vec_id", quantized("embedding").alias("q")).join(
        lsh_buckets(qe), "vec_id"
    )
    return hybrid_topk(
        spark,
        text_index_path,
        query,
        e,
        query_vec_id=QUERY_TEXT_ID,
        k=k,
        rrf_k=rrf_k,
        depth_mult=depth_mult,
        lsh_index=base.unionByName(qrow),
        pq=pq if pq is not None else build_pq_index(e),
    )
