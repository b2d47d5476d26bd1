"""BPE vocabulary induction and encoding — domain-specific tokenizer
training over the corpus (public recipe: Sennrich et al. 2016, the
word-frequency formulation every BPE trainer uses).

Why it scales: training never iterates over the CORPUS — it iterates over
the **distinct-word frequency table** (one corpus aggregate up front; a
100-TB crawl has a vocabulary orders of magnitude smaller than its token
stream).  Each merge step is then:

1. one map-side-combined aggregate over the word table (adjacent-pair
   counts weighted by word frequency),
2. a driver-side argmax (TakeOrdered 1 — a single row),
3. one Arrow-batched rewrite of the symbol arrays of words CONTAINING the
   winning pair (the inherently sequential in-word merge runs in
   ``mapInPandas``, like the Misra–Gries summaries — bounded per word,
   parallel across the table), lineage cut per iteration (the 2^k
   lesson).

``encode_bpe`` applies a trained merge list to the corpus in one
Arrow-batched pass (per-word memoized — each distinct word in a batch is
encoded once however often it repeats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (standard: lets merges learn suffixes)


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-sized pass of BPE
    training.  Map-side combined; the shuffle carries the vocabulary."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        docs.select(F.explode(F.split(F.trim(c), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    batch_size: int = 1,
) -> list:
    """Learn ``n_merges`` BPE merges; returns them in order as (left,
    right) symbol pairs.  Deterministic: ties on pair count break
    lexicographically.  Stops early when no pair occurs twice.

    ``batch_size``: merges selected per pair-count round.  1 (default)
    is EXACT Sennrich BPE — one count job + one rewrite per merge, which
    at a 32k-merge production vocabulary means 32k driver round-trips.
    ``batch_size=M`` selects up to M pairs per round whose symbols are
    pairwise DISJOINT — disjointness makes their batch-start counts
    still exact at application time and their within-batch application
    order irrelevant, so each selected pair is applied with a correct
    count.  The approximation (the standard practical-BPE tradeoff) is
    in the SELECTION: exact BPE might have preferred a pair newly
    created by an earlier merge in the same batch over a later selected
    one; the vocabulary differs slightly, the cost drops ~M× (one count
    + one rewrite + one checkpoint per M merges)."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    wf = word_frequencies(docs, text_col, lowercase)
    syms = wf.select(
        "freq",
        (
            F.concat(
                F.split(F.col("word"), ""),  # characters
                F.array(F.lit(END)),
            )
        ).alias("s"),
    ).localCheckpoint()

    merges: list = []
    prev = None  # release the previous iteration's checkpoint blocks
    while len(merges) < n_merges:
        pairs = (
            syms.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        want = min(batch_size, n_merges - len(merges))
        # over-collect so the disjointness filter can still fill the batch
        # (bounded: 8× the batch, single TakeOrdered)
        cand = pairs.filter(F.col("n") >= 2).orderBy(
            F.desc("n"), "l", "r"
        ).limit(want * 8).collect()
        if not cand:
            break
        picked: list = []
        used: set = set()
        for r in cand:
            left, right = r["l"], r["r"]
            if left in used or right in used:
                continue  # shares a symbol -> its count may be stale
            picked.append((left, right))
            used.update((left, right))
            if len(picked) >= want:
                break
        merges.extend(picked)

        def apply_merges(batches, _ms=tuple(picked)):
            for pdf in batches:
                out = []
                for s in pdf["s"]:
                    s = list(s)
                    for _l, _r in _ms:
                        i, res = 0, []
                        while i < len(s):
                            if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                                res.append(_l + _r)
                                i += 2
                            else:
                                res.append(s[i])
                                i += 1
                        s = res
                    out.append(s)
                pdf["s"] = out
                yield pdf

        prev = syms
        syms = syms.mapInPandas(
            apply_merges, "freq long, s array<string>"
        ).localCheckpoint()
        # the old checkpoint's blocks would otherwise pile up until GC +
        # ContextCleaner get around to them — n_merges cached copies of
        # the word table; explicit unpersist bounds it to two
        prev.unpersist()
    return merges


def _encode_word(word: str, ranks: dict) -> list:
    s = list(word) + [END]
    while len(s) > 1:
        best, bi = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        s[bi : bi + 2] = [s[bi] + s[bi + 1]]
    return s


def encode_bpe(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out_col``: the BPE token array for each document under the
    trained ``merges`` (earlier merge = higher priority, the standard
    rank-greedy encode).  One Arrow-batched pass; within a batch each
    DISTINCT word encodes once (memo dict), so repetitive corpora pay
    per-vocabulary, not per-token.  NULL text yields an empty array."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add MUTATES the frame's cached schema
    schema_out = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    ranks = {pair: i for i, pair in enumerate(merges)}
    # split on EXACTLY Java's \s class ([ \t\n\x0B\f\r]) — training
    # tokenizes with Spark's regex split, and Python str.split() treats
    # Unicode whitespace (NBSP etc.) as separators where Java does not;
    # a train/encode mismatch would void learned merges on crawl text
    import re

    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def enc(batches):
        memo: dict = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                if t is None or not t.strip(" \t\n\x0b\f\r"):
                    toks.append([])
                    continue
                s = (t.lower() if lowercase else t).strip(" \t\n\x0b\f\r")
                words = [w for w in _ws.split(s) if w]
                row: list = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    row.extend(got)
                toks.append(row)
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(enc, schema_out)
