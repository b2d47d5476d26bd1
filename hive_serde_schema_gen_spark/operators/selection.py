"""Corpus selection, mixing, and structural filtering — the knobs that
decide WHAT of the crawl becomes training data: deterministic
hash-threshold sampling and temperature mixes (document- and
token-denominated), per-domain quality percentile selection, exact
integer budget schedules, and the C4 per-line cleanup.  Split out of
``curation.py`` in round 14 (the façade re-exports every name).  Every
operator here is reproducibility-first: membership is a pure function of
(salt, key), budgets are exact integers, and nothing sorts corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def stratified_sample(
    d: DataFrame,
    rates: dict,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum subsampling — the domain-mixing step of a
    pretraining pipeline ("keep 100% of wiki, 30% of web, 5% of logs").

    Hash-threshold sampling, not ``df.sample``: membership is a pure
    function of (salt, key), so the sample is REPRODUCIBLE across runs,
    executors, and retries (Spark's sample() draws per-partition randoms
    — a task retry yields a different subset; a hash threshold cannot),
    and changing one stratum's rate never disturbs another's kept set.
    The rate map rides the plan as a literal CASE chain (strata counts are
    small); unlisted strata default to rate 0.0 — curation is allowlist-
    shaped on purpose.  Narrow transformation: filters at scan speed,
    no shuffle.

    ``hash_fn='md5'`` (``md5(salt|key)`` first 8 hex digits, the shared
    oracle scheme) exists so the cluster-balanced-sampling oracle can
    re-derive membership bit-for-bit; production stays on xxhash64."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(salt), F.col(key_col))
    elif hash_fn == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + "|"), F.col(key_col).cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    bucket = F.pmod(h, F.lit(1_000_000))
    expr = F.lit(0.0)
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == stratum, F.lit(float(rate))).otherwise(expr)
    return d.filter(bucket < expr * 1_000_000)


def temperature_mix_rates(
    counts: dict,
    alpha: float = 0.7,
    total: int | None = None,
    max_rate: float | None = 1.0,
) -> dict:
    """Temperature-sampling keep-rates from per-stratum corpus counts — the
    standard multilingual/source rebalancing rule (public recipe: the
    exponentiated-share sampling of multilingual pretraining, e.g. mBERT /
    XLM-R, α ≈ 0.3–0.7): target share ``q_s = n_s^α / Σ n_t^α`` flattens
    the head and boosts the tail as α → 0; α = 1 keeps natural
    proportions.

    Returns per-stratum rates for :func:`stratified_sample`:
    ``rate_s = q_s · total / n_s`` capped at ``max_rate`` (default 1.0: a
    stratum cannot yield more than it has, so tiny strata are kept whole
    and the realized total can undershoot ``total``).  Pass
    ``max_rate=None`` (or > 1) to emit UPSAMPLING rates — feed those to
    :func:`materialize_mixture`, which replicates rows (epochs) instead of
    filtering, so exact target shares are achievable.  ``total=None`` scales to
    the largest feasible target: the biggest total for which no rate
    exceeds 1, so the most-boosted stratum is kept in full and everything
    else is subsampled to match its share.

    Driver-side pure function on purpose: strata counts are tiny (they
    arrive from a map-side-combined groupBy count), and the output rides
    the plan as the literal CASE chain of ``stratified_sample`` — nothing
    here touches an executor."""
    if not counts:
        return {}
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    import math

    shares = {s: float(n) ** alpha for s, n in counts.items() if n > 0}
    # fsum: exactly-rounded and ORDER-INDEPENDENT — `counts` arrives from a
    # collect() whose row order is not deterministic, and a naive sum would
    # make the rates vary by an ULP between runs
    z = math.fsum(shares.values())
    q = {s: v / z for s, v in shares.items()}
    if total is None:
        # largest total with all rates <= 1:  total = min_s n_s / q_s
        total = min(counts[s] / q[s] for s in q)
    if max_rate is None:
        return {s: q[s] * total / counts[s] for s in q}
    return {s: min(max_rate, q[s] * total / counts[s]) for s in q}


def materialize_mixture(
    d: DataFrame,
    rates: dict,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize a domain mixture with rates that may EXCEED 1.0 — the
    upsampling twin of :func:`stratified_sample` ("4 epochs of wiki, 0.3 of
    web").  Each row is replicated ``floor(rate)`` times, plus one more for
    the deterministic hash-threshold fraction of rows selected by the
    FRACTIONAL part — so realized counts hit ``rate · n_s`` in expectation
    with the same retry-proof determinism as the downsampler (membership
    and copy-count are pure functions of (salt, key)).  An ``epoch_col``
    (1-based copy index) distinguishes replicas so downstream packing /
    split assignment can shuffle epochs apart instead of emitting byte-
    identical neighbors.

    For rates <= 1 this keeps EXACTLY the rows ``stratified_sample`` keeps
    (same salt, same bucket predicate) — asserted in tests, so a pipeline
    can swap the filter for the materializer without changing its sample.

    Scale: narrow transformation — a literal CASE chain for the rate, one
    ``explode(sequence(1, copies))`` per surviving row; no shuffle, no
    driver state.  Replication multiplies bytes, not keys, so it cannot
    introduce join skew that wasn't already in the data; unlisted strata
    default to rate 0 (allowlist-shaped, like the downsampler)."""
    rate = F.lit(0.0)
    for stratum, r in sorted(rates.items()):
        if r < 0:
            raise ValueError(f"negative rate for stratum {stratum!r}")
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    bucket = F.pmod(F.xxhash64(F.lit(salt), F.col(key_col)), F.lit(1_000_000))
    copies = (
        F.floor(rate).cast("int")
        + (bucket < (rate - F.floor(rate)) * 1_000_000).cast("int")
    )
    return (
        d.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
    )


def take_per_stratum(
    d: DataFrame,
    k: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "take-v1",
) -> DataFrame:
    """EXACTLY ``min(k, n_s)`` rows per stratum, chosen deterministically —
    the eval-set / human-review sampler (rate-based ``stratified_sample``
    can't promise exact counts; this can).  Selection order is
    ``xxhash64(salt, key)``: a pure function of the key, so the sample is
    stable across runs/retries, changing ``k`` only extends or truncates
    the same ordering (nested samples: the k=100 set contains the k=50
    set), and adding rows to OTHER strata never disturbs a stratum's pick.

    One window shuffle partitioned by stratum.  Skew note: the window sorts
    each stratum's rows within one partition — fine for the low-cardinality
    strata this is meant for; for a giant stratum, pre-filter with
    ``stratified_sample`` at a rate that overshoots k, then take exactly."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(stratum_col).orderBy(
        F.xxhash64(F.lit(salt), F.col(key_col)), key_col
    )
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratum_counts(d: DataFrame, stratum_col: str = "source") -> dict:
    """Per-stratum row counts as a driver dict (input to
    :func:`temperature_mix_rates`).  One map-side-combined groupBy over a
    low-cardinality column — the collect is bounded by the number of
    strata, not rows."""
    return {
        r[stratum_col]: r["n"]
        for r in d.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


# ---------------------------------------------------------------------------
# Round-13: token-budgeted mixture sampling (VERDICT r12 ask #8) — real
# pretraining mixes are specified in TOKENS per domain, not documents.
# ---------------------------------------------------------------------------

TOKMIX_SALT = "tokmix-v1"


def token_budget_mixture(
    d: DataFrame,
    budgets: dict,
    domain_col: str = "source",
    key_col: str = "doc_id",
    token_count_col=None,
    salt: str = TOKMIX_SALT,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Select documents per domain until each domain's TOKEN budget is
    met — deterministic hash-order greedy fill, the token-denominated
    sibling of :func:`stratified_sample` (which takes doc-rate knobs).

    Each domain's documents are ranked by ``hash(salt|key)`` (pure
    function of the key: reproducible across runs/retries, and one
    domain's budget change never disturbs another's selection — the
    stratified_sample reproducibility contract), and selected while the
    PRECEDING selected-token count is still under the budget, so the
    first crossing document is included ("fill to budget": realized
    tokens land in [budget, budget + max_doc_tokens) whenever the domain
    has supply; a domain smaller than its budget is kept whole).
    Domains absent from ``budgets`` get budget 0 — allowlist-shaped like
    every curation knob here.

    Output: (key, domain, n_tokens, tok_before) for SELECTED documents,
    where ``tok_before`` is the exact hash-order token prefix — the
    audit column that makes the budget accounting checkable row by row.
    Anti-join consumers take the keys.

    Scale shape (the ``packing.chunk_token_stream`` distributed prefix
    sum, re-keyed): the hash order is split into {n} hash-RANGE shards
    (a shard is an order prefix of the hash, so shard-local cumsums +
    an O(domains×shards) offsets join reconstruct the exact global
    prefix); no per-domain single-reducer window, no global sort.  One
    shuffle on (domain, shard); the offsets frame broadcasts.

    ``hash_fn='md5'`` is the shared oracle scheme (first 8 hex digits as
    an integer); production stays on xxhash64."""
    from pyspark.sql.window import Window as W

    from .packing import ws_token_count

    n_tok = (
        token_count_col if token_count_col is not None else ws_token_count()
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(salt), F.col(key_col))
        shift = 58  # full signed int64 range → 64 hash-range shards
    elif hash_fn == "md5":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + "|"), F.col(key_col).cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        shift = 26  # [0, 2^32) → 64 hash-range shards
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    base = d.select(
        F.col(key_col),
        F.col(domain_col).alias("__dom"),
        n_tok.alias("n_tokens"),
        h.alias("__hk"),
    ).withColumn("__shard", F.shiftright(F.col("__hk"), shift))
    local = base.withColumn(
        "__cum",
        F.coalesce(
            F.sum("n_tokens").over(
                W.partitionBy("__dom", "__shard")
                .orderBy("__hk", key_col)
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).localCheckpoint()  # rows + shard totals both consume it
    offsets = (
        local.groupBy("__dom", "__shard")
        .agg(F.max(F.col("__cum") + F.col("n_tokens")).alias("__t"))
        .select(
            "__dom",
            "__shard",
            F.coalesce(
                F.sum("__t").over(
                    W.partitionBy("__dom")
                    .orderBy("__shard")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )  # O(domains × 64) rows — broadcast side
    # budgets ride a broadcast frame, not a literal WHEN-chain: real
    # mixes carry thousands of per-domain budgets (a registry export),
    # and an O(#domains)-deep CASE expression bloats the Catalyst tree
    # and codegen where a tiny inner hash join costs nothing.  Inner
    # join = the allowlist semantics (absent domain ≡ budget 0).
    budf = d.sparkSession.createDataFrame(
        [(str(k), int(v)) for k, v in sorted(budgets.items())],
        "__domk string, __bud long",
    )
    return (
        local.join(F.broadcast(offsets), ["__dom", "__shard"])
        .join(
            F.broadcast(budf),
            F.col("__dom").cast("string") == F.col("__domk"),
        )
        .filter(F.col("__off") + F.col("__cum") < F.col("__bud"))
        .select(
            key_col,
            F.col("__dom").alias(domain_col),
            "n_tokens",
            (F.col("__off") + F.col("__cum")).alias("tok_before"),
        )
    )


# ---------------------------------------------------------------------------
# Round-13 continuation: per-domain quality percentile selection — the
# FineWeb-Edu-style "keep the top p fraction of each domain by classifier
# score" filter, the selection knob that follows a quality-classifier
# serve pass in a real curation pipeline.
# ---------------------------------------------------------------------------

#: quantization for score thresholds: serve scores are 9-dp
#: (logreg.classifier_score_calibrated rounds), so round(score·1e9) is
#: the exact integer the score IS — thresholds compare integers, never
#: floats.
QSEL_QUANT = 1_000_000_000
#: coarse-bucket width for the two-pass threshold: bucket = qs >> 20, so
#: the value-level refine inside the one boundary bucket per domain sees
#: at most 2^20 DISTINCT values (a groupBy over values, not rows) no
#: matter how many rows the domain holds.
QSEL_SHIFT = 20


def quality_top_fraction(
    scored: DataFrame,
    frac_num: int,
    frac_den: int,
    domain_col: str = "source",
    key_col: str = "doc_id",
    score_col: str = "score_cal",
    quant: int = QSEL_QUANT,
    shift: int = QSEL_SHIFT,
):
    """Keep the top ``frac_num/frac_den`` fraction of each domain's
    documents by score, ties INCLUDED — per domain with ``n`` docs the
    threshold ``t`` is the ``k``-th largest quantized score where
    ``k = max(1, n·frac_num // frac_den)`` (integer arithmetic, so an
    oracle re-derives ``k`` exactly), and every row with ``qs >= t`` is
    selected (≥ k rows when score ties straddle the cut — the
    deterministic, order-free semantics: selection depends only on the
    score value, never on row order or a tiebreak hash).

    Returns ``(selected, report)``: ``selected`` is
    ``(key, domain, qs)`` for kept rows; ``report`` is one row per
    domain — ``(domain, n_docs, k, threshold, n_sel)`` — the accounting
    frame.

    Scale shape — the k-th largest WITHOUT a per-domain row sort (a
    skewed domain would otherwise sort its whole partition):

    1. coarse pass: ``groupBy(domain, qs >> shift)`` counts —
       O(domains × 2^(log₂quant − shift)) rows, metadata-sized;
       a cumulative window over THAT tiny frame finds each domain's
       boundary bucket (the bucket containing the k-th largest);
    2. refine pass: only boundary-bucket ROWS are re-aggregated, and
       by VALUE (``groupBy(domain, qs)``) — ≤ 2^shift distinct values
       per domain by construction — so the second cumulative window is
       again over metadata;
    3. the per-domain thresholds broadcast back over the corpus for the
       final filter.

    Both windows partition by domain over value-histogram frames
    (bounded rows per partition by construction), never over the corpus.
    ``scored`` is consumed three times (coarse, refine, final filter) —
    it is localCheckpointed here so the serve chain runs once."""
    from pyspark.sql.window import Window as W

    if not (0 < int(frac_num) <= int(frac_den)):
        raise ValueError(
            f"frac_num/frac_den must be a fraction in (0, 1]: got "
            f"{frac_num}/{frac_den} (num > den would silently select "
            "nothing — k exceeds every domain's size)"
        )
    base = scored.select(
        F.col(key_col),
        F.col(domain_col).alias("__dom"),
        F.round(F.col(score_col) * quant).cast("long").alias("__qs"),
    ).filter(F.col("__qs").isNotNull()).localCheckpoint()
    kf = base.groupBy("__dom").agg(F.count(F.lit(1)).alias("n_docs")).select(
        "__dom",
        "n_docs",
        F.expr(
            f"greatest(CAST(1 AS BIGINT), (n_docs * {int(frac_num)})"
            f" DIV {int(frac_den)})"
        ).alias("__k"),
    )
    coarse = base.groupBy(
        "__dom", F.shiftright("__qs", shift).alias("__cb")
    ).agg(F.count(F.lit(1)).alias("__c"))
    wdesc = W.partitionBy("__dom").orderBy(F.desc("__cb"))
    bound = (
        coarse.withColumn(
            "__cum",
            F.sum("__c").over(wdesc.rowsBetween(W.unboundedPreceding, 0)),
        )
        .join(kf, "__dom")
        .filter(F.col("__cum") >= F.col("__k"))
        .withColumn("__rn", F.row_number().over(wdesc))
        .filter(F.col("__rn") == 1)
        .select(
            "__dom",
            "__cb",
            (F.col("__cum") - F.col("__c")).alias("__above"),
            "n_docs",
            "__k",
        )
    )
    wv = W.partitionBy("__dom").orderBy(F.desc("__qs"))
    th = (
        base.withColumn("__cb", F.shiftright("__qs", shift))
        .join(F.broadcast(bound), ["__dom", "__cb"])
        .groupBy("__dom", "__qs", "__above", "n_docs", "__k")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__cum",
            F.sum("__c").over(wv.rowsBetween(W.unboundedPreceding, 0)),
        )
        .filter(F.col("__above") + F.col("__cum") >= F.col("__k"))
        .withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .select(
            "__dom",
            F.col("__qs").alias("__t"),
            "n_docs",
            "__k",
        )
    )
    selected = (
        base.join(F.broadcast(th.select("__dom", "__t")), "__dom")
        .filter(F.col("__qs") >= F.col("__t"))
        .select(
            key_col,
            F.col("__dom").alias(domain_col),
            F.col("__qs").alias("qs"),
        )
        .localCheckpoint()  # rows + the report both consume it
    )
    report = (
        selected.groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("n_sel"))
        .join(th, "__dom")
        .select(
            F.col("__dom").alias(domain_col),
            "n_docs",
            F.col("__k").alias("k"),
            F.col("__t").alias("threshold"),
            "n_sel",
        )
    )
    return selected, report


def integer_temperature_budgets(
    token_totals: dict, total_tokens: int
) -> dict:
    """Per-domain TOKEN budgets from per-domain token totals under the
    α=0.5 temperature rule, in INTEGER arithmetic end to end:
    ``share_s = floor(sqrt(T_s))``, ``budget_s = min(T_s,
    share_s·total // Σ share)``.  floor-of-double-sqrt is provably exact
    for T < 2^52 (IEEE sqrt is correctly rounded), so a DuckDB oracle
    re-derives every budget bit-for-bit — the engine-neutral variant of
    :func:`temperature_mix_rates` (whose float shares are fsum-ordered
    driver-side and fine for production, but an ULP of share wobble
    could flip an oracle's crossing document)."""
    import math

    shares = {s: math.isqrt(int(t)) for s, t in token_totals.items() if t > 0}
    z = sum(shares.values())
    if z == 0:
        return {}
    return {
        s: min(int(token_totals[s]), shares[s] * int(total_tokens) // z)
        for s in shares
    }


def _integer_nth_root(x: int, n: int) -> int:
    """floor(x^(1/n)) in exact integer arithmetic (Newton's method on
    ints — no float enters, so no 2^53 precision cliff; for n=2 this
    equals math.isqrt)."""
    if x < 0 or n <= 0:
        raise ValueError("x >= 0 and n >= 1 required")
    if x in (0, 1) or n == 1:
        return x
    r = 1 << (x.bit_length() // n + 1)  # upper bound on the root
    while True:
        nxt = ((n - 1) * r + x // r ** (n - 1)) // n
        if nxt >= r:
            return r
        r = nxt


def integer_power_budgets(
    token_totals: dict, total_tokens: int, alpha_num: int, alpha_den: int
) -> dict:
    """:func:`integer_temperature_budgets` generalized to any RATIONAL
    temperature α = alpha_num/alpha_den: ``share_s = floor(T_s^α)`` via
    exact integer nth-root of ``T^num`` (no float anywhere, so the
    budgets are reproducible bit-for-bit on any engine), then
    ``budget_s = min(T_s, share_s·total // Σ share)``.  α=1 is the
    natural mix, α=1/2 the standard temperature flattening, α→0 uniform
    — the knob a mixture SCHEDULE sweeps."""
    if alpha_num <= 0 or alpha_den <= 0:
        raise ValueError("alpha must be a positive rational")
    shares = {
        s: _integer_nth_root(int(t) ** alpha_num, alpha_den)
        for s, t in token_totals.items()
        if t > 0
    }
    z = sum(shares.values())
    if z == 0:
        return {}
    return {
        s: min(int(token_totals[s]), shares[s] * int(total_tokens) // z)
        for s in shares
    }


def anneal_temperature_schedule(
    token_totals: dict, tokens_per_epoch: int, alphas
) -> list:
    """Per-epoch budget dicts for an ANNEALED mixture — the midtraining
    recipe (early epochs at the natural mix, late epochs flattened /
    quality-weighted): ``alphas`` is a list of ``(num, den)`` rational
    temperatures, one per epoch, e.g. ``[(1, 1), (3, 4), (1, 2)]``.
    Feed each epoch's dict to :func:`token_budget_mixture` (with a
    per-epoch salt if re-selection should be independent) and the
    selected rows to ``packing.training_manifest`` with the matching
    epoch — the complete annealed training-order export, every step
    deterministic."""
    return [
        integer_power_budgets(token_totals, tokens_per_epoch, n, d)
        for n, d in alphas
    ]


# ---------------------------------------------------------------------------
# C4-style per-line cleanup (Raffel et al. 2020, §2.2 — the public
# line-rule recipe most crawl pipelines apply before any statistical
# filter).  Rules are per-LINE and per-DOC; everything is array
# expressions inside whole-stage codegen — no Python, no shuffle.
# ---------------------------------------------------------------------------

#: default C4-shaped rule knobs
C4_MIN_LINE_WORDS = 3
C4_MIN_DOC_LINES = 3
C4_TERMINALS = (".", "!", "?", '"', "'")
C4_BLOCKLIST = ("lorem ipsum", "javascript", "cookie policy")


def c4_line_filter(
    docs: DataFrame,
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_doc_lines: int = C4_MIN_DOC_LINES,
    terminals: tuple = C4_TERMINALS,
    blocklist: tuple = C4_BLOCKLIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """The C4 line-level cleanup: keep only lines that (a) end in a
    terminal punctuation mark, (b) have at least ``min_line_words``
    words, and (c) contain no blocklisted phrase (case-insensitive);
    then DROP whole documents left with fewer than ``min_doc_lines``
    surviving lines.  Returns ``(id, text, n_lines_kept,
    n_lines_dropped)`` with ``text`` rebuilt from the surviving lines.

    This is the structural cleanup that runs BEFORE statistical
    filters (Gopher rules, classifiers, perplexity): nav bars, button
    labels, and cookie banners are line-shaped noise that per-document
    statistics only see as diluted averages.  Complements
    ``dedup.strip_boilerplate_lines`` (cross-document frequency) with
    purely LOCAL rules — no aggregate over the corpus at all, so the
    whole operator is one narrow codegen projection at scan speed.

    Deviation from the C4 recipe: C4 drops the WHOLE PAGE when a
    blocklisted phrase ("lorem ipsum") appears anywhere; here the rule is
    line-level like the other two — only the offending line is dropped
    (the document still dies if too few lines survive).  ``delim`` is
    treated as a LITERAL separator on both the split and the rejoin
    (quoted with ``\\Q…\\E`` for the regex-based split), so a delimiter
    like ``'.'`` behaves identically in both directions.  A delimiter
    containing the literal two-char sequence ``\\E`` would terminate
    the ``\\Q`` quoting early and change split semantics, so it is
    spliced (``\\E`` → end-quote, escaped ``\\``+``E``, re-open-quote)
    — the standard quoting-safe splice — keeping split and rejoin in
    agreement for EVERY delimiter."""
    quoted = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = F.split(F.col(text_col), quoted)
    trimmed = F.transform(lines, lambda ln: F.trim(ln))
    term_ok = lambda ln: F.array_contains(  # noqa: E731
        F.array(*[F.lit(t) for t in terminals]), F.substring(ln, -1, 1)
    )
    words_ok = lambda ln: (  # noqa: E731
        F.size(F.filter(F.split(ln, "[ \t\n\x0B\f\r]+"), lambda w: w != ""))
        >= min_line_words
    )
    if blocklist:
        block_ok = lambda ln: ~F.array_contains(  # noqa: E731
            F.array(
                *[
                    F.lower(ln).contains(F.lit(p.lower()))
                    for p in blocklist
                ]
            ),
            F.lit(True),
        )
    else:
        block_ok = lambda ln: F.lit(True)  # noqa: E731
    kept = F.filter(
        trimmed,
        lambda ln: term_ok(ln) & words_ok(ln) & block_ok(ln),
    )
    out = docs.select(
        id_col,
        kept.alias("__kept"),
        F.size(trimmed).alias("__total"),
    ).select(
        id_col,
        F.array_join("__kept", delim).alias(text_col),
        F.size("__kept").alias("n_lines_kept"),
        (F.col("__total") - F.size("__kept")).alias("n_lines_dropped"),
    )
    return out.filter(F.col("n_lines_kept") >= min_doc_lines)


def unimax_budgets(
    token_totals: dict,
    total_tokens: int,
    max_epochs_num: int = 1,
    max_epochs_den: int = 1,
) -> dict:
    """UniMax-style per-domain TOKEN budgets (public recipe: Chung et
    al. 2023, "UniMax: Fairer and More Effective Language Sampling" —
    the multilingual-pretraining allocation that temperature rules
    approximate badly at the tails): distribute ``total_tokens`` as
    UNIFORMLY as possible across domains, except no domain may exceed
    ``max_epochs`` passes over its own data (cap
    ``C_s = T_s · num // den`` — a rational epoch bound, so 1/1 is
    dedup-strict single-epoch and 4/1 allows the common small-domain
    4-epoch repeat).

    Exact integer waterfilling: visit domains in ascending-cap order
    (name tiebreak — deterministic), give each
    ``min(cap, remaining // domains_left)``; flooring leftovers then
    distribute one token at a time to uncapped domains in
    descending-cap order.  Properties (pinned in tests): Σ budgets =
    min(total, Σ caps); every budget ≤ its cap; uncapped budgets differ
    by ≤ 1 (the fairness claim); adding tokens never shrinks any
    domain's budget (monotone).  Driver-side pure function like
    :func:`integer_temperature_budgets` — the output feeds
    :func:`token_budget_mixture` (budgets ≤ T_s) or
    :func:`materialize_mixture` epochs (budgets > T_s)."""
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if max_epochs_num <= 0 or max_epochs_den <= 0:
        raise ValueError("max_epochs must be a positive rational")
    caps = {
        s: int(t) * max_epochs_num // max_epochs_den
        for s, t in token_totals.items()
        if t > 0
    }
    order = sorted(caps, key=lambda s: (caps[s], s))
    budgets: dict = {}
    remaining = int(total_tokens)
    for i, s in enumerate(order):
        share = remaining // (len(order) - i)
        b = min(caps[s], share)
        budgets[s] = b
        remaining -= b
    # flooring leftovers: one token at a time to uncapped domains,
    # largest cap first (they have the most headroom), name tiebreak
    if remaining > 0:
        open_doms = sorted(
            (s for s in order if budgets[s] < caps[s]),
            key=lambda s: (-caps[s], s),
        )
        while remaining > 0 and open_doms:
            for s in open_doms:
                if remaining == 0:
                    break
                if budgets[s] < caps[s]:
                    budgets[s] += 1
                    remaining -= 1
            open_doms = [s for s in open_doms if budgets[s] < caps[s]]
    return budgets
