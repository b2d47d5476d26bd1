"""Advanced operators Spark lacks natively: as-of join, skew-salted join,
deterministic median, approximate distinct (guide: "Common OLAP patterns").
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.decimal_safe import money_sum
from ..functions.union import pad_union
from ..registry import query
from ..sources.tables import load_table
from .relational import (
    _HISTOGRAM_SQL,
    _ROLLUP_CUBE_SQL,
    _SET_OPS_SQL,
    histogram_totalprice,
    rollup_cube_agg,
    set_ops,
)

SALT_BUCKETS = 8


@query(
    "asof_join_last_order",
    oracle="""
    WITH o1 AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate)
    SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
    FROM events e ASOF JOIN o1 o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    ORDER BY e.event_id
    """,
)
def asof_join_last_order(spark, sf_dir):
    """As-of join (each event ↔ the user's latest order at or before the
    event) via the union+window trick — Spark has no native ASOF:

    union both streams tagged, window ``last(..., ignorenulls)`` per key
    ordered by (time, tag) — order rows sort before events at equal
    timestamps, giving <= semantics.  One shuffle on the key, no
    per-group Python (contrast ``pd.merge_asof`` in applyInPandas, which
    is the fallback when the payload is too wide to window).

    Orders are pre-deduped per (custkey, date) keeping max orderkey so the
    as-of pick is deterministic in both engines."""
    e = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "tag", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        left.unionByName(right)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter((F.col("tag") == 1) & F.col("last_orderkey").isNotNull())
        .select("event_id", F.col("k").alias("user_id"), "last_orderkey")
        .orderBy("event_id")
    )


_MEDIAN_SQL = """
    SELECT l_returnflag, l_extendedprice AS median_price FROM (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
    WHERE rn = (n + 1) // 2
"""


def median_disc_price(spark, sf_dir, sort: bool = True, lineitem=None):
    """Discrete median per group, deterministically: the ⌈n/2⌉-th element in
    a total order (value + unique tiebreak).  Interpolated medians differ
    across engines in the last ulp of the midpoint arithmetic; element
    selection cannot.  At scale prefer ``percentile_approx`` (see
    ``approx_stats``) — an exact median costs a per-group sort.
    Registry-merged into ``stats_summary`` in round 8.

    ``lineitem`` overrides the table load (round 18: ``stats_summary``
    shares ONE materialized lineitem projection across its arms instead
    of re-scanning the source per arm)."""
    l = (
        lineitem
        if lineitem is not None
        else load_table(spark, sf_dir, "lineitem")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = W.partitionBy("l_returnflag")
    out = (
        l.select(
            "l_returnflag",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("l_returnflag", F.col("l_extendedprice").alias("median_price"))
    )
    return out.orderBy("l_returnflag") if sort else out


@query(
    "skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def skew_salted_join(spark, sf_dir):
    """Skew-salted join: events.user_id is heavily skewed (few users, many
    events), so a vanilla shuffle join hot-spots one task per hot key.
    Salting fans each fact key into {s} sub-keys and replicates the dim row
    {s}× — the shuffle spreads evenly; results are identical (the oracle is
    the unsalted SQL).  AQE's skew-join split handles moderate skew
    automatically; explicit salting is the deterministic heavy-artillery
    version that also works for aggregations."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "salt", (F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS))).cast("int")
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    return (
        e.join(
            c,
            (e.user_id == c.c_custkey) & (e.salt == c.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


skew_salted_join.__doc__ = skew_salted_join.__doc__ and skew_salted_join.__doc__.format(s=SALT_BUCKETS)



_MERGE_UPSERT_SQL = """
    WITH updates AS (
        SELECT o_custkey, o_totalprice AS new_bal FROM (
            SELECT o_custkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1)
    SELECT c.c_custkey,
           c.c_acctbal AS old_balance,
           COALESCE(u.new_bal, c.c_acctbal) AS balance,
           CASE WHEN u.o_custkey IS NOT NULL THEN 'updated' ELSE 'unchanged' END AS status
    FROM customer c LEFT JOIN updates u ON u.o_custkey = c.c_custkey
"""


def merge_upsert_emulation(spark, sf_dir, sort: bool = True):
    """MERGE INTO emulation (no Delta in this image): latest-order-per-key
    updates applied to the customer dimension via outer join + COALESCE —
    the guide's CDC/SCD pattern (registry-merged into ``set_merge_ops`` in
    round 9).  One shuffle each side on the key; with a Delta/Iceberg
    table this becomes a real MERGE with file-level pruning, but the
    logical shape is identical."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    updates = (
        o.select("o_custkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_totalprice").alias("new_bal"))
    )
    c = load_table(spark, sf_dir, "customer")
    out = c.join(updates, updates.o_custkey == c.c_custkey, "left").select(
        "c_custkey",
        F.col("c_acctbal").alias("old_balance"),
        F.coalesce("new_bal", "c_acctbal").alias("balance"),
        F.when(F.col("o_custkey").isNotNull(), "updated")
        .otherwise("unchanged")
        .alias("status"),
    )
    return out.orderBy("c_custkey") if sort else out


def range_join_bucketed(
    points,
    intervals,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    keys: tuple[str, ...] = (),
):
    """Range join (point ∈ [start, end], plus optional equi-keys) that plans
    as an equi-join, not a nested loop.

    Spark turns a bare ``p.ts BETWEEN i.start AND i.end`` join into
    BroadcastNestedLoopJoin (or a cartesian product) — O(|points|×|intervals|)
    and a scale-killer.  The standard fix (same trick DuckDB/Databricks apply
    under "range join optimization") synthesizes an equi-key from time:

    - each point maps to its bucket ``floor(t / bucket)``;
    - each interval EXPLODES to every bucket it overlaps
      (``sequence(floor(start/b), floor(end/b))`` — blow-up factor is
      interval_len/bucket, bounded by choosing ``bucket`` ≈ typical length);
    - equi-join on (keys…, bucket) → shuffle/broadcast HASH join;
    - the exact range predicate remains as a residual filter.

    Matches the naive join row-for-row (asserted in
    ``tests/test_range_join.py``) while the plan stays hash-based — the
    nested-loop node is asserted ABSENT.  ``point_col``/``start_col``/
    ``end_col`` are epoch numbers (cast timestamps first); ``bucket`` is in
    the same unit."""
    p = points.withColumn("__bkt", F.floor(F.col(point_col) / bucket))
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket),
                F.floor(F.col(end_col) / bucket),
            )
        ),
    )
    cond = (p["__bkt"] == i["__bkt"]) & (
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    for k in keys:
        cond = cond & (p[k] == i[k])
    joined = p.join(i, cond)
    # project away the helper column and any duplicated key columns
    drop = [p["__bkt"], i["__bkt"]] + [i[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined


RANGE_WINDOW_US = 6 * 3600 * 1_000_000  # interval length (and bucket width)


@query(
    "range_join_bucketed",
    oracle=f"""
    SELECT p.event_id, i.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(i.ts)) // 1000000 AS lag_sec
    FROM events p JOIN events i
      ON p.user_id = i.user_id
     AND p.event_type = 'click' AND i.event_type = 'purchase'
     AND epoch_us(p.ts) BETWEEN epoch_us(i.ts)
                            AND epoch_us(i.ts) + CAST({RANGE_WINDOW_US} AS BIGINT)
    ORDER BY p.event_id, purchase_id
    """,
)
def range_join_events(spark, sf_dir):
    """Every click within 6 hours AFTER a purchase by the same user — a
    point-in-interval range join executed via ``range_join_bucketed``
    (interval explode to time buckets → hash equi-join + residual filter).
    The oracle is the naive BETWEEN join: row-for-row equivalence of the
    bucketed plan with the nested-loop semantics is exactly the claim.
    The hash-join (not BroadcastNestedLoop) plan shape is asserted in
    tests/test_range_join.py."""
    e = load_table(spark, sf_dir, "events")
    points = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + F.lit(RANGE_WINDOW_US)).alias("end_us"),
    )
    joined = range_join_bucketed(
        points, intervals, "t", "start_us", "end_us", RANGE_WINDOW_US,
        keys=("user_id",),
    )
    return joined.select(
        "event_id",
        "purchase_id",
        F.expr("(t - start_us) DIV 1000000").alias("lag_sec"),
    ).orderBy("event_id", "purchase_id")


TIME_LEVELS = ("year", "month", "day", "hour")
_LEVEL_EXPRS = {
    "year": lambda c: F.year(c),
    "month": lambda c: F.month(c),
    "day": lambda c: F.dayofmonth(c),
    "hour": lambda c: F.hour(c),
}


def time_rollup(df, ts_col: str, aggs: dict, levels: tuple[str, ...] = TIME_LEVELS):
    """Hypertable-style continuous-aggregate rollup: one pass produces the
    aggregate at EVERY time granularity (hour ⊂ day ⊂ month ⊂ year ⊂ total).

    Spark-first shape: derive the calendar components, ``ROLLUP`` over them
    — Catalyst computes the hierarchy with map-side partial aggregation and
    a single shuffle (one Expand + one Aggregate, not one job per level),
    which is exactly the maintenance computation behind a TimescaleDB
    continuous aggregate / materialized hypertable rollup.  ``grain`` labels
    each output row's granularity (``total`` for the grand-total row).

    ``aggs`` maps output name → aggregate Column, e.g.
    ``{"n": F.count(F.lit(1)), "v": F.sum("value")}``.  Only
    decomposable aggregates (count/sum/min/max/avg-via-sum+count, sketches)
    belong here — the same restriction every incremental-rollup system has.
    At scale, write each grain partition to the sink partitioned by
    (grain, year) for pruned reads."""
    parts = [_LEVEL_EXPRS[lv](F.col(ts_col)).alias(lv) for lv in levels]
    rolled = (
        df.select("*", *parts)
        .rollup(*[F.col(lv) for lv in levels])
        # grouping_id is only defined inside the grouping aggregate itself
        .agg(
            F.grouping_id(*[F.col(lv) for lv in levels]).alias("__gid"),
            *[a.alias(name) for name, a in aggs.items()],
        )
    )
    # bit i of grouping_id set ⇔ level i aggregated away; ROLLUP yields only
    # prefixes, so the id maps 1:1 to a grain label
    full = (1 << len(levels)) - 1
    grain = F.when(F.col("__gid") == full, "total")
    for i, lv in enumerate(levels):
        grain = grain.when(F.col("__gid") == (full >> (i + 1)), lv)
    return rolled.select(grain.alias("grain"), *levels, *aggs.keys())


_TIME_ROLLUP_SQL = """
    WITH parts AS (
      SELECT CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
             CAST(day(ts) AS INTEGER) AS day, CAST(hour(ts) AS INTEGER) AS hour,
             value
      FROM events),
    rolled AS (
      SELECT year, month, day, hour, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM parts GROUP BY ROLLUP (year, month, day, hour))
    SELECT CASE WHEN hour IS NOT NULL THEN 'hour'
                WHEN day IS NOT NULL THEN 'day'
                WHEN month IS NOT NULL THEN 'month'
                WHEN year IS NOT NULL THEN 'year'
                ELSE 'total' END AS grain,
           year, month, day, hour, n, total_value
    FROM rolled
"""


def time_rollup_events(spark, sf_dir, sort: bool = True):
    """Hypertable-style continuous-aggregate rollup over ``events``: count +
    exact money-sum at EVERY calendar grain (hour ⊂ day ⊂ month ⊂ year ⊂
    total) in one ROLLUP pass — single Expand + single shuffle (plan shape
    asserted in tests/test_time_rollup.py; registry-merged into
    ``rollup_agg`` in round 9).  The oracle recomputes the same
    hierarchy with DuckDB's ROLLUP, labeling grain by which level survived
    aggregation (events.ts is never NULL, so NULLs only come from ROLLUP)."""
    e = load_table(spark, sf_dir, "events")
    out = time_rollup(
        e, "ts", {"n": F.count(F.lit(1)), "total_value": money_sum("value")}
    )
    if sort:
        out = out.orderBy(
            "grain",
            F.col("year").asc_nulls_first(),
            F.col("month").asc_nulls_first(),
            F.col("day").asc_nulls_first(),
            F.col("hour").asc_nulls_first(),
        )
    return out


APPROX_REL_ERR = 0.05  # evidence floor for every sketch column


def _exact_pct_x100(pct: int):
    """Exact interpolated percentile over integer cents, scaled ×100 so the
    result stays a BIGINT — zero float ops, so bit-identical cross-engine.

    rank position = (n-1)*pct/100 split into integer index + integer
    remainder (``idx = (n-1)*pct div 100``, ``rem = (n-1)*pct mod 100``);
    value×100 = lo*100 + (hi-lo)*rem.  All operands non-negative, so
    Spark ``div``/`%` and DuckDB ``//``/`%` agree.  ``hi`` exists whenever
    rem>0 (idx ≤ n-2 there); when rem=0 the coalesce keeps lo alone."""
    idx = F.expr(f"((n - 1) * {pct}) div 100")
    rem = F.expr(f"((n - 1) * {pct}) % 100")
    lo = F.max(F.when(F.col("rn") - 1 == idx, F.col("cents")))
    hi = F.max(F.when(F.col("rn") - 1 == idx + 1, F.col("cents")))
    return (lo * 100 + F.coalesce(hi - lo, F.lit(0)) * F.max(rem)).alias(
        f"exact_p{pct}_x100"
    )


_APPROX_SQL = f"""
    WITH c AS (
      SELECT l_returnflag, l_partkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    r AS (
      SELECT l_returnflag, cents,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM c),
    q AS (
      SELECT l_returnflag,
             CAST(MAX(CASE WHEN rn - 1 = ((n-1)*50)//100 THEN cents END) * 100
                  + COALESCE(MAX(CASE WHEN rn - 1 = ((n-1)*50)//100 + 1 THEN cents END)
                             - MAX(CASE WHEN rn - 1 = ((n-1)*50)//100 THEN cents END), 0)
                    * MAX(((n-1)*50) % 100) AS BIGINT) AS exact_p50_x100,
             CAST(MAX(CASE WHEN rn - 1 = ((n-1)*99)//100 THEN cents END) * 100
                  + COALESCE(MAX(CASE WHEN rn - 1 = ((n-1)*99)//100 + 1 THEN cents END)
                             - MAX(CASE WHEN rn - 1 = ((n-1)*99)//100 THEN cents END), 0)
                    * MAX(((n-1)*99) % 100) AS BIGINT) AS exact_p99_x100
      FROM r GROUP BY l_returnflag),
    d AS (
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      FROM lineitem GROUP BY l_returnflag)
    SELECT q.l_returnflag, d.exact_parts, q.exact_p50_x100, q.exact_p99_x100,
           TRUE AS ok_parts, TRUE AS ok_median, TRUE AS ok_p99
    FROM q JOIN d USING (l_returnflag)
"""


def approx_stats(spark, sf_dir, sort: bool = True, lineitem=None):
    """Approximate aggregates — the sketches that replace exact
    distinct/quantiles at 100 TB: HyperLogLog++ distinct counts (constant
    memory vs a distinct shuffle) and t-digest-style quantiles (one pass).

    Driver-green despite the approximation: the RESULT carries only
    deterministic columns — the exact counterparts (integer cents ×100, a
    self-defined interpolation with zero float ops, so bit-identical in
    DuckDB) plus boolean evidence ``ok_* = rel_err <= 0.05`` comparing each
    sketch against its exact value.  The oracle recomputes the exact
    columns and emits the matching literal booleans, so a sketch drifting
    past the floor breaks the hash — the accuracy contract IS the
    correctness check (floors also asserted in tests/test_advanced.py).
    The exact columns cost what the sketches avoid (distinct + sort
    shuffles) — they are the evidence harness, not the production path."""
    # three independent aggregations (windowed percentiles, exact distinct,
    # sketches) consume this narrow projection — materialize it once
    # (localCheckpoint: released on GC) instead of scanning lineitem three
    # times (AQE does not dedupe identical scans across branches).  When
    # the caller already passes a materialized frame (``stats_summary``
    # shares one checkpoint across all its lineitem arms), the cents
    # projection is narrow compute over checkpoint blocks — no second
    # checkpoint needed.
    cents_proj = lambda d: d.select(  # noqa: E731
        "l_returnflag",
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    if lineitem is not None:
        l = cents_proj(lineitem)
    else:
        l = cents_proj(
            load_table(spark, sf_dir, "lineitem")
        ).localCheckpoint()

    r = l.select(
        "l_returnflag",
        "cents",
        F.row_number()
        .over(W.partitionBy("l_returnflag").orderBy("cents"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).alias("n"),
    )
    exact_q = r.groupBy("l_returnflag").agg(
        _exact_pct_x100(50), _exact_pct_x100(99)
    )
    # COUNT(DISTINCT) and the sketches live in separate aggregates: mixing
    # a distinct aggregate with percentile buffers forces Spark through
    # planAggregateWithOneDistinct (an Expand replicating every row through
    # the buffers — measured ~10× slower).
    exact_d = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("cents", 0.5, 10000).alias("approx_p50_c"),
        F.percentile_approx("cents", 0.99, 10000).alias("approx_p99_c"),
    )

    def ok(approx_x100, exact_x100, name):
        return (
            F.abs(approx_x100.cast("double") - F.col(exact_x100).cast("double"))
            <= F.lit(APPROX_REL_ERR) * F.col(exact_x100).cast("double")
        ).alias(name)

    out = (
        exact_q.join(exact_d, "l_returnflag")
        .join(sketches, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_p50_x100",
            "exact_p99_x100",
            (
                F.abs(
                    F.col("approx_parts").cast("double")
                    - F.col("exact_parts").cast("double")
                )
                <= F.lit(APPROX_REL_ERR) * F.col("exact_parts").cast("double")
            ).alias("ok_parts"),
            ok(F.col("approx_p50_c") * 100, "exact_p50_x100", "ok_median"),
            ok(F.col("approx_p99_c") * 100, "exact_p99_x100", "ok_p99"),
        )
    )
    return out.orderBy("l_returnflag") if sort else out


def _sketch_evidence_sql() -> str:
    from .sketches import SKETCH_KEY_MOD

    mod = SKETCH_KEY_MOD
    return f"""
    WITH dk AS (SELECT DISTINCT lang, doc_id % {mod} AS k FROM documents),
    langs AS (SELECT DISTINCT lang FROM documents),
    skpairs AS (SELECT la.lang AS a, lb.lang AS b
                FROM langs la JOIN langs lb ON la.lang < lb.lang),
    skinter AS (
      SELECT x.lang AS a, y.lang AS b, COUNT(DISTINCT x.k) AS i
      FROM dk x JOIN dk y ON y.k = x.k AND x.lang < y.lang
      GROUP BY x.lang, y.lang),
    skmed AS (
      SELECT n_chars FROM (
        SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
               COUNT(*) OVER () AS cnt
        FROM documents)
      WHERE rn = (cnt + 1) // 2)
    SELECT 'sketch' AS sop, lang AS grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id % {mod}) AS BIGINT) AS exact_parts,
           TRUE AS ok
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'sketch_ov', p.a || '|' || p.b, NULL,
           CAST(COALESCE(i.i, 0) AS BIGINT), TRUE
    FROM skpairs p LEFT JOIN skinter i ON i.a = p.a AND i.b = p.b
    UNION ALL
    SELECT 'sketch_u', '__union__', NULL,
           CAST(COUNT(DISTINCT doc_id % {mod}) AS BIGINT), TRUE
    FROM documents
    UNION ALL
    SELECT 'sketch_q', '__all__', NULL,
           CAST((SELECT n_chars FROM skmed) AS BIGINT), TRUE
    """


def _diag_evidence_sql() -> str:
    """Oracle fragment for the op='skew'/'prof' branches — re-derives
    skew_report's exact columns (rank/key/count/share/suggested_salt; the
    `/` operator is double division of integers in BOTH Spark SQL and
    DuckDB, so share and the CEIL argument are the same single IEEE ops)
    and column_profile's exact columns under the planted-null
    construction.  The HLL accuracy contracts are Spark-side booleans the
    oracle pins to TRUE (`diagnostics.SKEW_COLS` docs)."""
    from .diagnostics import (
        PROF_COLS, PROF_NULL_MOD, SKEW_COLS, SKEW_K, SKEW_PARTS,
    )

    ctes, sels = [], []
    for i, c in enumerate(SKEW_COLS):
        ctes.append(
            f"""skc{i} AS (SELECT CAST({c} AS VARCHAR) AS key,
                COUNT(*) AS cnt FROM orders GROUP BY 1),
    skt{i} AS (SELECT '{c}' AS colname, key, cnt,
                ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rnk
               FROM skc{i} QUALIFY rnk <= {SKEW_K})"""
        )
        sels.append(f"SELECT * FROM skt{i}")
    numeric = {"doc_id", "n_chars"}
    profs = []
    for c in PROF_COLS:
        v = c if c in numeric else f"LENGTH({c})"
        profs.append(
            f"""SELECT 'prof' AS dop, '{c}' AS grp,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS INTEGER)
             AS bucket,
           COUNT(*) AS n, AVG({v}) AS dval,
           CAST(MIN({v}) AS BIGINT) AS dlo, CAST(MAX({v}) AS BIGINT) AS dhi,
           TRUE AS ok
    FROM profsrc"""
        )
    return f"""
    WITH sktot AS (SELECT COUNT(*) AS nrows FROM orders),
    {",".join(ctes)},
    skall AS ({" UNION ALL ".join(sels)}),
    profsrc AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % {PROF_NULL_MOD} = 0 THEN NULL ELSE lang END
               AS lang,
             n_chars
      FROM documents)
    SELECT 'skew' AS dop, colname || '|' || key AS grp, rnk AS bucket,
           CAST(cnt AS BIGINT) AS n, cnt / nrows AS dval,
           CAST(CEIL(cnt / (nrows / {SKEW_PARTS})) AS BIGINT) AS dlo,
           CAST(NULL AS BIGINT) AS dhi, TRUE AS ok
    FROM skall, sktot
    UNION ALL
    {" UNION ALL ".join(profs)}
    """


# op='freq' configuration: frequent_items (Misra–Gries heavy hitters,
# diagnostics.py) over the documents token stream.  capacity=64 exceeds
# the corpus's ~31-token vocabulary so every per-partition summary is
# EXACT, candidate_multiple*k=40 candidates cover every key (cut=0), and
# the k-th count sits ~2× above the N/capacity exclusion bound — the
# `guaranteed` validity flag is robustly TRUE and the slot would catch a
# regression in either the summary merge or the bound arithmetic.
_FREQ_K = 10
_FREQ_CAPACITY = 64

_FREQ_SQL = f"""
    WITH freqtok AS (
      SELECT unnest(list_filter(string_split_regex(TRIM(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                                x -> x <> '')) AS w
      FROM documents)
    SELECT w, COUNT(*) AS cnt FROM freqtok GROUP BY w
    ORDER BY cnt DESC, w LIMIT {_FREQ_K}
"""


@query(
    "stats_summary",
    oracle=f"""
    SELECT * FROM (
    SELECT 'approx' AS op, l_returnflag AS grp, CAST(NULL AS INTEGER) AS bucket,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS median_price,
           exact_parts, exact_p50_x100, exact_p99_x100,
           ok_parts, ok_median, ok_p99
    FROM ({_APPROX_SQL})
    UNION ALL
    SELECT 'median', l_returnflag, NULL, NULL, median_price,
           NULL, NULL, NULL, NULL, NULL, NULL
    FROM ({_MEDIAN_SQL})
    UNION ALL
    SELECT 'hist', NULL, bucket, n, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM ({_HISTOGRAM_SQL})
    UNION ALL
    SELECT sop, grp, NULL, n, NULL, exact_parts, NULL, NULL, ok, NULL, NULL
    FROM ({_sketch_evidence_sql()})
    UNION ALL
    SELECT 'freq', w, NULL, cnt, NULL, NULL, NULL, NULL, TRUE, NULL, NULL
    FROM ({_FREQ_SQL})
    UNION ALL
    SELECT dop, grp, bucket, n, dval, NULL, dlo, dhi, ok, NULL, NULL
    FROM ({_diag_evidence_sql()})
    ) ORDER BY op, COALESCE(grp, ''), COALESCE(bucket, -1)
    """,
)
def stats_summary(spark, sf_dir):
    """The distribution-statistics family in ONE driver slot (round-8
    tagged-union merge of ``approx_stats`` + ``median_disc_price`` +
    ``histogram_totalprice`` — the merge freed registry room for round-7
    operators; each component plan is unchanged and the approx sketches
    keep their accuracy-contract booleans).  See the component docstrings
    for the per-operator scale notes.

    Round-11 continuation: op='sketch'/'sketch_ov'/'sketch_u'/'sketch_q'
    carry the MERGEABLE-sketch family (`operators/sketches.py` — the
    DataSketches HLL/Theta/KLL artifact layer) under the same
    accuracy-contract pattern: per-language artifacts over the documents
    table, pairwise Theta overlaps, the merge-only union distinct, and
    the merged-KLL median — each pinned as an exact value + an
    in-tolerance boolean (`sketches.sketch_evidence_rows`).

    op='freq' pins :func:`diagnostics.frequent_items` — the bounded-
    shuffle Misra–Gries heavy-hitters path (per-partition Arrow-batched
    summaries → merged lower bounds → broadcast-verified exact counts) —
    over the documents token stream at (k={_FREQ_K},
    capacity={_FREQ_CAPACITY}, with_validity=True): the exact top-k
    token counts ride grp/n and the validity `guaranteed` flag rides
    ok_parts (see `_FREQ_K` for why it is deterministically TRUE).

    op='skew'/'prof' carry the rest of the diagnostics family
    (`diagnostics.diag_evidence_rows`): skew_report's hot-key table over
    the orders join keys (rank/key/count/share/suggested_salt exact in
    the hash; the HLL inside skew_factor pinned via the rsd=0.02 accuracy
    contract) and column_profile over documents with planted lang nulls
    (rows/nulls/min/max/mean exact — integral inputs, single IEEE
    division; sketch outputs under the same contract boolean)."""
    from ..functions.union import pad_union
    from ..sources.tables import load_table
    from .diagnostics import diag_evidence_rows, frequent_items
    from .sketches import sketch_evidence_rows

    # Round 18 (guide §6.1): ONE materialized narrow projection per source
    # table, shared by every arm that consumes it — before this the union
    # re-scanned lineitem twice, orders six times and documents eight
    # times (one full scan per arm branch / eager evidence job; 48
    # Exchanges in the plan).  localCheckpoint (not cache) so the blocks
    # are released when the frames are GC'd after the query; each arm's
    # own computation is unchanged — only its input node is.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", "l_partkey", "l_extendedprice",
            "l_orderkey", "l_linenumber",
        )
        .localCheckpoint()
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderstatus", "o_totalprice")
        .localCheckpoint()
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .localCheckpoint()
    )

    schema = [
        ("op", "string"), ("grp", "string"), ("bucket", "int"),
        ("n", "bigint"), ("median_price", "double"),
        ("exact_parts", "bigint"), ("exact_p50_x100", "bigint"),
        ("exact_p99_x100", "bigint"), ("ok_parts", "boolean"),
        ("ok_median", "boolean"), ("ok_p99", "boolean"),
    ]
    return pad_union(
        schema,
        (
            approx_stats(spark, sf_dir, sort=False, lineitem=li),
            {
                "op": F.lit("approx"), "grp": "l_returnflag",
                "exact_parts": "exact_parts",
                "exact_p50_x100": "exact_p50_x100",
                "exact_p99_x100": "exact_p99_x100",
                "ok_parts": "ok_parts", "ok_median": "ok_median",
                "ok_p99": "ok_p99",
            },
        ),
        (
            median_disc_price(spark, sf_dir, sort=False, lineitem=li),
            {
                "op": F.lit("median"), "grp": "l_returnflag",
                "median_price": "median_price",
            },
        ),
        (
            histogram_totalprice(spark, sf_dir, sort=False, orders=ords),
            {"op": F.lit("hist"), "bucket": "bucket", "n": "n"},
        ),
        (
            sketch_evidence_rows(spark, sf_dir, docs=docs),
            {
                "op": "sop", "grp": "grp", "n": "n",
                "exact_parts": "exact_parts", "ok_parts": "ok",
            },
        ),
        (
            frequent_items(
                docs.select(
                    F.explode(
                        F.filter(
                            F.split(F.lower(F.trim(F.col("text"))), "[ \t\n\x0B\f\r]+"),
                            lambda t: t != "",
                        )
                    ).alias("w")
                ),
                "w",
                k=_FREQ_K,
                capacity=_FREQ_CAPACITY,
                with_validity=True,
            ),
            {
                "op": F.lit("freq"), "grp": "key", "n": "count",
                "ok_parts": "guaranteed",
            },
        ),
        (
            diag_evidence_rows(spark, sf_dir, orders=ords, docs=docs),
            {
                "op": "dop", "grp": "grp", "bucket": "bucket", "n": "n",
                "median_price": "dval", "exact_p50_x100": "dlo",
                "exact_p99_x100": "dhi", "ok_parts": "ok",
            },
        ),
    ).orderBy(
        "op", F.coalesce("grp", F.lit("")), F.coalesce("bucket", F.lit(-1))
    )


# ---------------------------------------------------------------------------
# Round-9 merged registry slots (freeing slots for the round-8 library ops)
# ---------------------------------------------------------------------------


@query(
    "rollup_set_ops",
    oracle=f"""
    SELECT op, k1, k2, CAST(NULL AS INTEGER) AS year,
           CAST(NULL AS INTEGER) AS month, CAST(NULL AS INTEGER) AS day,
           CAST(NULL AS INTEGER) AS hour, n, sum_qty,
           CAST(NULL AS DOUBLE) AS total_value,
           CAST(NULL AS BIGINT) AS custkey,
           CAST(NULL AS DOUBLE) AS old_balance,
           CAST(NULL AS DOUBLE) AS balance, CAST(NULL AS VARCHAR) AS status
    FROM ({_ROLLUP_CUBE_SQL}) rc
    UNION ALL
    SELECT 'time' AS op, grain AS k1, CAST(NULL AS VARCHAR) AS k2,
           year, month, day, hour, n,
           CAST(NULL AS DOUBLE) AS sum_qty, total_value,
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM ({_TIME_ROLLUP_SQL}) tr
    UNION ALL
    SELECT op, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(o_custkey AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS VARCHAR)
    FROM ({_SET_OPS_SQL}) so
    UNION ALL
    SELECT 'merge', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(c_custkey AS BIGINT),
           old_balance, balance, status
    FROM ({_MERGE_UPSERT_SQL}) mu
    ORDER BY op, k1 NULLS FIRST, k2 NULLS FIRST, year NULLS FIRST,
             month NULLS FIRST, day NULLS FIRST, hour NULLS FIRST,
             custkey NULLS FIRST
    """,
)
def rollup_set_ops(spark, sf_dir):
    """Grouping-set expansions + set operators + MERGE emulation in ONE
    driver slot (round 17 union of the former ``rollup_agg`` and
    ``set_merge_ops`` slots — both themselves round-9 tagged unions, both
    green since; one ceded its registry place to the packing-family split
    that localizes the r15/r16 driver hash divergence).  Component
    docstrings carry the plan notes: ``rollup``/``cube``/``gsets`` rows
    are the lineitem/orders hierarchical subtotals; ``time`` rows the
    hypertable-style calendar-grain rollup over events (grain rides
    ``k1``); ``intersect``/``except``/``union`` rows the year-over-year
    customer-activity set algebra (key rides ``custkey``); ``merge`` rows
    the latest-order CDC upsert applied to the customer dimension."""
    schema = [
        ("op", "string"), ("k1", "string"), ("k2", "string"),
        ("year", "int"), ("month", "int"), ("day", "int"), ("hour", "int"),
        ("n", "bigint"), ("sum_qty", "double"), ("total_value", "double"),
        ("custkey", "bigint"), ("old_balance", "double"),
        ("balance", "double"), ("status", "string"),
    ]
    return pad_union(
        schema,
        (
            rollup_cube_agg(spark, sf_dir, sort=False),
            {"op": "op", "k1": "k1", "k2": "k2", "n": "n",
             "sum_qty": "sum_qty"},
        ),
        (
            time_rollup_events(spark, sf_dir, sort=False),
            {"op": F.lit("time"), "k1": "grain", "year": "year",
             "month": "month", "day": "day", "hour": "hour", "n": "n",
             "total_value": "total_value"},
        ),
        (
            set_ops(spark, sf_dir, sort=False),
            {"op": "op", "custkey": "o_custkey"},
        ),
        (
            merge_upsert_emulation(spark, sf_dir, sort=False),
            {"op": F.lit("merge"), "custkey": "c_custkey",
             "old_balance": "old_balance", "balance": "balance",
             "status": "status"},
        ),
    ).orderBy(
        "op",
        F.col("k1").asc_nulls_first(),
        F.col("k2").asc_nulls_first(),
        F.col("year").asc_nulls_first(),
        F.col("month").asc_nulls_first(),
        F.col("day").asc_nulls_first(),
        F.col("hour").asc_nulls_first(),
        F.col("custkey").asc_nulls_first(),
    )
