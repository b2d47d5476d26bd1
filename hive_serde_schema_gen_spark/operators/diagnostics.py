"""Shuffle-skew diagnostics — the measurement half of the salting story
(``advanced.skew_salted_join`` is the cure; this is the instrument).

Before a 100-TB join/aggregate you want to KNOW whether a key is hot and
how many salt sub-keys would level it, not discover it from a straggler
task 4 hours in.  ``skew_report`` answers both in one map-side-combined
pass per key column.

(No reference counterpart — ``Schemer.scala`` has no join surface; this is
engine-side scale machinery.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    cols,
    k: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Top-``k`` hottest keys per column with the numbers that decide a
    salting strategy:

    - ``share``: the key's fraction of all rows;
    - ``skew_factor``: its count over the MEAN per-key count (1.0 = uniform;
      the classic hot-key smell is 100×+);
    - ``suggested_salt``: ``ceil(count / (rows / n_partitions))`` — the
      number of sub-keys that shrinks this key's largest shuffle partition
      to about an average one (1 = no salting needed).  ``n_partitions``
      defaults to ``spark.sql.shuffle.partitions``.

    Per column: one groupBy-count feeding a distributed top-k
    (TakeOrderedAndProject) plus one shuffle-FREE scan for the totals
    (``count`` + HyperLogLog distinct — so ``skew_factor`` uses the ~2%
    approx distinct; hot-key detection doesn't care).  Both aggregates are
    map-side combined — a hot key is ONE row after partial aggregation, so
    the diagnostic itself cannot skew.  Run it on the join key of both
    sides before sizing ``SALT_BUCKETS``; re-run per ingest era, hot keys
    drift."""
    from pyspark.sql.window import Window as W

    if isinstance(cols, str):
        cols = [cols]
    if n_partitions is None:
        n_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    reports = []
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("key")).agg(
            F.count(F.lit(1)).alias("count")
        )
        # totals come from a scan of df itself, NOT an aggregate over
        # `counts`: referencing the groupBy subtree from two plan branches
        # would execute the full count-shuffle twice; this branch shuffles
        # nothing (global agg, HLL distinct)
        totals = df.agg(
            F.count(F.lit(1)).alias("__rows"),
            F.approx_count_distinct(c).alias("__keys"),
        )
        # orderBy+limit plans as TakeOrderedAndProject — a distributed
        # per-partition top-k then driver merge, NEVER a single-partition
        # sort of all distinct keys; the rank window then runs over k rows
        w = W.orderBy(F.desc("count"), "key")
        top = (
            counts.orderBy(F.desc("count"), "key")
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .crossJoin(F.broadcast(totals))
        )
        reports.append(
            top.select(
                F.lit(c).alias("column"),
                "rank",
                "key",
                "count",
                (F.col("count") / F.col("__rows")).alias("share"),
                (F.col("count") * F.col("__keys") / F.col("__rows")).alias(
                    "skew_factor"
                ),
                F.ceil(
                    F.col("count") / (F.col("__rows") / F.lit(n_partitions))
                )
                .cast("int")
                .alias("suggested_salt"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def column_profile(df: DataFrame, cols=None) -> list:
    """One-pass column profiling (the Deequ-profiles step that decides which
    ``validation`` checks to pin): per column — type, null count/fraction,
    approx distinct (HyperLogLog), min/max, and for numerics mean, stddev,
    p50/p95 (``percentile_approx``).

    ALL columns profile in ONE map-side-combined aggregate pass regardless
    of count — the profile row is O(columns), so collecting it is driver-
    bounded at any data size.  String min/max are computed on length (the
    lexicographic min of a text column is rarely the question; its length
    envelope — think VARCHAR sizing, the Layer-A question — is)."""
    from pyspark.sql import types as T

    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = list(fields)
    aggs, layout = [], []
    for i, c in enumerate(cols):
        t = fields[c].simpleString()
        # real type check, not a name-prefix match ("interval day to
        # second" starts with "int" but cannot cast to double)
        num = isinstance(fields[c], T.NumericType)
        v = F.col(c) if num else F.length(F.col(c).cast("string"))
        pre = f"c{i}"
        aggs += [
            F.count(F.lit(1)).alias(f"{pre}_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{pre}_nulls"),
            F.approx_count_distinct(c).alias(f"{pre}_distinct"),
            F.min(v).cast("double").alias(f"{pre}_min"),
            F.max(v).cast("double").alias(f"{pre}_max"),
            F.avg(v).cast("double").alias(f"{pre}_mean"),
            F.stddev(v).cast("double").alias(f"{pre}_stddev"),
            F.percentile_approx(v, 0.5).cast("double").alias(f"{pre}_p50"),
            F.percentile_approx(v, 0.95).cast("double").alias(f"{pre}_p95"),
        ]
        layout.append((c, t, num, pre))
    row = df.agg(*aggs).collect()[0]
    out = []
    for c, t, num, pre in layout:
        rows = row[f"{pre}_rows"]
        nulls = row[f"{pre}_nulls"] or 0
        out.append(
            {
                "column": c,
                "type": t,
                "rows": rows,
                "nulls": nulls,
                "null_frac": (nulls / rows) if rows else 0.0,
                "approx_distinct": row[f"{pre}_distinct"],
                "measured": "value" if num else "length",
                "min": row[f"{pre}_min"],
                "max": row[f"{pre}_max"],
                "mean": row[f"{pre}_mean"],
                "stddev": row[f"{pre}_stddev"],
                "p50": row[f"{pre}_p50"],
                "p95": row[f"{pre}_p95"],
            }
        )
    return out


def _mg_summaries(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: <= ``capacity`` (key, cnt) rows
    per partition, where ``cnt`` UNDER-estimates the partition-local count
    by at most ``n_partition / capacity`` — the classic bound, so every key
    with partition frequency above that error survives.  Arrow-batched:
    pandas ``value_counts`` per batch (vectorized), one decrement-compact
    whenever the counter set overflows 4× capacity."""
    import pandas as pd

    def summarize(batches):
        cnt = None
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            cnt = vc if cnt is None else cnt.add(vc, fill_value=0)
            if len(cnt) > 4 * capacity:
                thresh = cnt.nlargest(capacity + 1).iloc[-1]
                cnt = cnt - thresh
                cnt = cnt[cnt > 0]
        if cnt is None or cnt.empty:
            return
        if len(cnt) > capacity:
            thresh = cnt.nlargest(capacity + 1).iloc[-1]
            cnt = cnt - thresh
            cnt = cnt[cnt > 0]
        yield pd.DataFrame(
            {"key": cnt.index.astype(str), "cnt": cnt.values.astype("int64")}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "key string, cnt long"
    )


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
    candidate_multiple: int = 4,
    with_validity: bool = False,
) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``col`` with bounded shuffle —
    the heavy-hitters operator for key spaces too large to groupBy whole
    (every distinct n-gram / URL / token of a 100-TB corpus).

    A plain ``groupBy(col).count()`` shuffles the ENTIRE distinct key space;
    this instead runs two scans and shuffles almost nothing:

    1. Per-partition Misra–Gries summaries (``capacity`` rows each, Arrow-
       batched) → merge lower bounds → top ``candidate_multiple * k``
       candidate keys.  Any key with global frequency > N/capacity is
       guaranteed present in the merged summaries; candidates can only
       miss a true top-k key if more than ``candidate_multiple * k`` keys
       out-bound it — raise ``capacity`` (tighter bounds) or
       ``candidate_multiple`` if the head of your distribution is that
       flat.
    2. Exact verification: broadcast the candidate keys, filtered
       groupBy-count (map-side combined over the candidates), exact top-k.

    Returns ``(key, count)`` with EXACT counts, ordered desc.  The counts
    are always exact; the RANKING is guaranteed complete only when no
    excluded key could out-count the k-th result.  ``with_validity=True``
    checks that guarantee explicitly (two extra driver-bounded jobs) and
    appends a constant ``guaranteed`` boolean column: any key outside the
    candidate set has true count <= cut + N/capacity, where ``cut`` is the
    smallest merged lower bound that survived the candidate limit (0 when
    the limit didn't bind) and N/capacity bounds the total MG
    underestimate — ``guaranteed`` compares the k-th exact count against
    that bound, so a silent top-k miss cannot happen without the flag
    dropping to false.  The driver holds <= candidate_multiple·k candidate
    keys; the shuffles carry <= capacity·partitions and <=
    candidate_multiple·k rows respectively."""
    n_cand = candidate_multiple * k
    cand_full = (
        _mg_summaries(df, col, capacity)
        .groupBy("key")
        .agg(F.sum("cnt").alias("lower"))
        .orderBy(F.desc("lower"), "key")
        .limit(n_cand)
    )
    if with_validity:
        cand_full = cand_full.localCheckpoint()  # reused by top + bound
    top = (
        df.select(F.col(col).cast("string").alias("key"))
        .join(F.broadcast(cand_full.select("key")), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "key")
        .limit(k)
    )
    if not with_validity:
        return top
    stats = cand_full.agg(
        F.count(F.lit(1)).alias("n"), F.min("lower").alias("cut")
    ).collect()[0]
    n_nonnull = df.filter(F.col(col).isNotNull()).count()
    # bound on the true count of ANY key excluded from the candidates
    bound = n_nonnull / capacity + (
        stats["cut"] if stats["n"] == n_cand else 0
    )
    rows = top.localCheckpoint()
    collected = rows.collect()
    kth = min((r["count"] for r in collected), default=0)
    # strict >: at equality an excluded key could tie (and under k results
    # an excluded key could claim a free slot unless no key can reach 1)
    guaranteed = kth > bound if len(collected) >= k else bound < 1
    return rows.withColumn("guaranteed", F.lit(bool(guaranteed)))


# ---------------------------------------------------------------------------
# Driver-evidence configuration (the stats_summary op='skew'/'prof' branches)
# ---------------------------------------------------------------------------
# op='skew': skew_report over the orders join keys.  k/n_partitions are
# pinned literals (the session's shuffle-partition conf varies between the
# driver and the test harness).  Everything in the hash is exact: rank,
# key, count, share (one IEEE division of exact BIGINTs — identical in
# both engines) and suggested_salt (CEIL over `/`, which is double
# division of integers in BOTH Spark SQL and DuckDB).  skew_factor uses
# the HLL distinct estimate, so it stays OUT of the hash; instead the
# branch pins the usual accuracy contract — a fresh rsd=0.02 estimate per
# key column lands within APPROX_REL_ERR of the exact distinct count.
SKEW_COLS = ("o_custkey", "o_orderstatus")
SKEW_K = 10
SKEW_PARTS = 32

# op='prof': column_profile over documents with nulls PLANTED into lang
# (doc_id % PROF_NULL_MOD == 0 → NULL, byte-identical construction in the
# oracle) so the null-counting path is non-trivially exercised.  Pinned
# per column: rows, nulls, min/max (value for numerics, length for
# strings — both integral here, so the doubles are exact), and mean (an
# exact integer sum over <= 2^53 followed by one IEEE division — Spark's
# Average and DuckDB's AVG both reduce integers exactly before the
# divide).  approx_distinct and the percentile sketches stay OUT of the
# hash; the HLL rides the same rsd=0.02 accuracy contract, and stddev/
# p50/p95 are order-dependent float folds (excluded, like every other
# float reduction in the oracle surface).
PROF_COLS = ("doc_id", "text", "lang", "n_chars")
PROF_NULL_MOD = 5


def diag_evidence_rows(spark, sf_dir, orders=None, docs=None):
    """The diagnostics family's driver-evidence rows (consumed by the
    ``stats_summary`` tagged union): op='skew' pins :func:`skew_report`
    over the orders join keys, op='prof' pins :func:`column_profile` over
    the documents table with planted lang nulls.  Output schema
    ``(dop, grp, bucket, n, dval, dlo, dhi, ok)`` maps onto the union's
    op/grp/bucket/n/median_price/exact_p50_x100/exact_p99_x100/ok_parts
    carriers.  Driver traffic is O(columns) rows — the profile row and the
    two accuracy-contract scalars — exactly the operators' documented
    driver bounds.

    ``orders``/``docs`` override the table loads (round 18: the caller
    shares one materialized projection per source table across arms;
    ``docs`` is the RAW frame — the lang nulls are planted here)."""
    from ..operators.advanced import APPROX_REL_ERR
    from ..sources.tables import load_table

    if orders is None:
        orders = load_table(spark, sf_dir, "orders")
    rep = skew_report(
        orders, list(SKEW_COLS), k=SKEW_K, n_partitions=SKEW_PARTS
    )
    # HLL accuracy contract per skew column — ONE aggregate for the exact
    # and sketch sides together (round 18; was two full scans).  The
    # multi-distinct Expand this forces replicates each row once per
    # distinct group over LIGHT buffers only — cheap, unlike mixing
    # distincts with percentile buffers (see approx_stats), and both
    # aggregate VALUES are plan-shape-independent (exact count; HLL is a
    # deterministic function of the data).
    ea = orders.agg(
        *[F.countDistinct(c).alias(f"e_{c}") for c in SKEW_COLS],
        *[
            F.approx_count_distinct(c, rsd=0.02).alias(f"a_{c}")
            for c in SKEW_COLS
        ],
    ).collect()[0]
    ok_rows = [
        (
            c,
            bool(
                abs(ea[f"a_{c}"] - ea[f"e_{c}"])
                <= APPROX_REL_ERR * ea[f"e_{c}"]
            ),
        )
        for c in SKEW_COLS
    ]
    ok_df = spark.createDataFrame(ok_rows, "column string, ok boolean")
    skew_ev = rep.join(F.broadcast(ok_df), "column").select(
        F.lit("skew").alias("dop"),
        F.concat(F.col("column"), F.lit("|"), F.col("key")).alias("grp"),
        F.col("rank").alias("bucket"),
        F.col("count").alias("n"),
        F.col("share").alias("dval"),
        F.col("suggested_salt").cast("bigint").alias("dlo"),
        F.lit(None).cast("bigint").alias("dhi"),
        F.col("ok"),
    )
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % PROF_NULL_MOD == 0, F.lit(None))
        .otherwise(F.col("lang"))
        .alias("lang"),
        "n_chars",
    )
    prof = column_profile(docs, list(PROF_COLS))
    # the contract estimate is rsd=0.02 (like the sketch branches) — the
    # profile's own default-rsd estimate has 1σ AT the 0.05 evidence
    # floor, which would make the boolean a coin flip, not a contract.
    # Exact + sketch sides in ONE aggregate (round 18; same rationale as
    # the skew contract above — was two full scans of documents).
    pea = docs.agg(
        *[F.countDistinct(c).alias(f"e_{c}") for c in PROF_COLS],
        *[
            F.approx_count_distinct(c, rsd=0.02).alias(f"a_{c}")
            for c in PROF_COLS
        ],
    ).collect()[0]
    prof_rows = [
        (
            "prof",
            p["column"],
            int(p["nulls"]),
            int(p["rows"]),
            float(p["mean"]),
            int(p["min"]),
            int(p["max"]),
            bool(
                abs(pea[f"a_{p['column']}"] - pea[f"e_{p['column']}"])
                <= APPROX_REL_ERR * pea[f"e_{p['column']}"]
            ),
        )
        for p in prof
    ]
    prof_df = spark.createDataFrame(
        prof_rows,
        "dop string, grp string, bucket int, n bigint, dval double, "
        "dlo bigint, dhi bigint, ok boolean",
    )
    return skew_ev.unionByName(prof_df)
