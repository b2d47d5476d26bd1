"""Mergeable-sketch statistics (Apache DataSketches, built into Spark SQL):
the incremental monitoring layer of a 100-TB pipeline — per-source /
per-epoch sketch ARTIFACTS that answer distinct / overlap / quantile
questions later WITHOUT rescanning the data that produced them.

Why sketches and not exact aggregates:

- **Mergeable**: an HLL/Theta/KLL sketch of epoch 47 combines with epochs
  0–46 by a tiny ``*_union_agg`` over stored binaries — "distinct docs all
  time" costs O(epochs), not a rescan of 100 TB.
- **Set algebra without joins**: the Theta intersection estimates "how much
  of source A duplicates source B" from two KB-sized sketches — the exact
  answer is a distributed join of both sources.
- **Bounded size**: every sketch is KBs regardless of input cardinality,
  so the artifact table stays driver-readable forever.

All operators here are thin, typed wrappers over the SQL functions
(``hll_sketch_agg`` / ``theta_*`` / ``kll_*``) — one map-side-combined
aggregate to BUILD, metadata-sized frames ever after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# SQL sketch functions this module calls, keyed by the Spark release that
# introduced them (each verified against `DESCRIBE FUNCTION EXTENDED`'s
# `Since:` line on Spark 4.1).  The PACKAGE floor stays pyspark>=3.4 (set
# by the schema-inference core + streaming); this surface gates itself at
# call time with the same fail-fast-naming-the-floor contract as
# ``streaming/stateful.py:_require_state_api`` — never an unresolved-
# function AnalysisException deep inside a plan.
SKETCH_FN_FLOORS = {
    "hll_sketch_agg": "3.5.0",
    "hll_sketch_estimate": "3.5.0",
    "hll_union_agg": "3.5.0",
    "theta_sketch_agg": "4.1.0",
    "theta_sketch_estimate": "4.1.0",
    "theta_union": "4.1.0",
    "theta_union_agg": "4.1.0",
    "theta_intersection": "4.1.0",
    "kll_sketch_agg_double": "4.1.0",
    "kll_merge_agg_double": "4.1.0",
    "kll_sketch_get_quantile_double": "4.1.0",
}


def _require_sketch_functions(spark: SparkSession, names) -> None:
    """Fail fast WITH the version contract: gate on actual function
    availability (robust to backports), name the documented floor in the
    error.  Cheap — ``functionExists`` is a registry lookup, no job."""
    missing = [n for n in names if not spark.catalog.functionExists(n)]
    if missing:  # pragma: no cover - exercised only on old PySpark
        import pyspark

        floors = ", ".join(
            f"{n} (Spark >= {SKETCH_FN_FLOORS[n]})" for n in missing
        )
        raise NotImplementedError(
            f"mergeable-sketch SQL functions unavailable on pyspark "
            f"{pyspark.__version__}: {floors}.  The package floor is "
            "pyspark>=3.4 (schema-inference core); the sketch surface "
            "needs 3.5 for HLL and 4.1 for Theta/KLL — upgrade PySpark, "
            "or use exact aggregates (countDistinct / approx stats) for "
            "this workload"
        )


def group_sketches(
    d: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Per-group sketch row: ``(group, rows, hll, theta[, kll])`` — the
    artifact to persist per source/epoch.  ``key_col`` feeds the distinct/
    overlap sketches (doc digest, URL, user id); ``value_col`` (numeric)
    feeds the KLL quantile sketch.  One aggregate pass; every sketch is
    map-side combined by Spark's partial aggregation."""
    need = ["hll_sketch_agg", "theta_sketch_agg"]
    if value_col is not None:
        need.append("kll_sketch_agg_double")
    _require_sketch_functions(d.sparkSession, need)
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.expr(f"hll_sketch_agg({key_col})").alias("hll"),
        F.expr(f"theta_sketch_agg({key_col})").alias("theta"),
    ]
    if value_col is not None:
        aggs.append(
            F.expr(f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE))").alias(
                "kll"
            )
        )
    return d.groupBy(F.col(group_col).alias("group")).agg(*aggs)


def union_distinct(sketches: DataFrame) -> int:
    """Distinct-key estimate over the UNION of all sketch rows — merge-only
    (no data rescan): e.g. 'unique documents across every epoch so far'."""
    _require_sketch_functions(
        sketches.sparkSession, ["hll_union_agg", "hll_sketch_estimate"]
    )
    return int(
        sketches.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(hll))")
        ).collect()[0][0]
    )


def overlap_estimates(sketches: DataFrame) -> DataFrame:
    """Pairwise overlap between groups from Theta sketches alone:
    ``(group_a, group_b, inter, union, jaccard, contain_a_in_b)`` for every
    unordered pair — the 'how much of crawl B have we already got from
    crawl A' question, answered in O(groups²) sketch ops instead of a
    distributed join of every pair of sources.  ``contain_a_in_b`` =
    |A∩B| / |A| (containment is the dedup-planning number: 0.9 means
    ingesting B's overlap with A is 90% wasted work)."""
    _require_sketch_functions(
        sketches.sparkSession,
        ["theta_sketch_estimate", "theta_intersection", "theta_union"],
    )
    a, b = sketches.alias("a"), sketches.alias("b")
    inter = F.expr("theta_sketch_estimate(theta_intersection(a.theta, b.theta))")
    uni = F.expr("theta_sketch_estimate(theta_union(a.theta, b.theta))")
    est_a = F.expr("theta_sketch_estimate(a.theta)")
    return (
        a.join(b, F.col("a.group") < F.col("b.group"))
        .select(
            F.col("a.group").alias("group_a"),
            F.col("b.group").alias("group_b"),
            inter.alias("inter"),
            uni.alias("union"),
            (inter / F.greatest(uni, F.lit(1.0))).alias("jaccard"),
            (inter / F.greatest(est_a, F.lit(1.0))).alias("contain_a_in_b"),
        )
    )


# Driver-evidence configuration (the stats_summary op='sketch*' branches):
# keys are doc_id mod SKETCH_KEY_MOD so language groups OVERLAP (the Theta
# intersection has something to estimate); tolerances follow the
# approx_stats accuracy-contract pattern.
SKETCH_KEY_MOD = 50
SKETCH_REL_ERR = 0.05
SKETCH_Q_REL_ERR = 0.10  # KLL rank error maps to a wider value tolerance


def sketch_evidence_rows(spark, sf_dir, docs=None):
    """Driver-hashable evidence for the WHOLE mergeable-sketch family —
    the ``approx_stats`` accuracy-contract pattern applied to
    :func:`group_sketches` / :func:`union_distinct` /
    :func:`overlap_estimates` / :func:`merged_quantiles`: every emitted
    column is either an EXACT value (re-derivable in SQL) or a boolean
    asserting the sketch estimate sits within tolerance of it, so a
    sketch drifting breaks the hash while the estimate itself (whose
    bits are library-version-specific) never enters it.

    Rows (grp, n, exact_parts, ok):
    - op='sketch' per language: the artifact's exact row counter and the
      HLL distinct-key estimate vs exact COUNT(DISTINCT doc_id % mod)
    - op='sketch_ov' per language pair: Theta intersection vs the exact
      overlap (keys shared across groups by construction)
    - op='sketch_u': merge-only union distinct vs the global exact
    - op='sketch_q': merged-KLL median of n_chars vs the exact discrete
      median (value at rank (n+1) div 2)

    Driver cost: two bounded scalars (union estimate, merged quantile) —
    both are merge-only sketch reads, the exact thing this module exists
    to make cheap.

    ``docs`` overrides the table load (round 18: the ``stats_summary``
    caller shares one materialized documents projection across arms)."""
    from ..sources.tables import load_table

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.pmod(F.col("doc_id"), F.lit(SKETCH_KEY_MOD)).alias("k"),
        "n_chars",
    )
    sk = group_sketches(d, "lang", "k", "n_chars").localCheckpoint()
    exact = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("__rows"),
        F.countDistinct("k").alias("__nd"),
    )
    tol = lambda e: F.greatest(  # noqa: E731
        F.lit(SKETCH_REL_ERR) * e.cast("double"), F.lit(1.0)
    )
    hll_est = F.expr("hll_sketch_estimate(hll)").cast("double")
    per_group = sk.join(exact, sk["group"] == exact["lang"]).select(
        F.lit("sketch").alias("sop"),
        F.col("group").alias("grp"),
        F.col("rows").cast("bigint").alias("n"),
        F.col("__nd").cast("bigint").alias("exact_parts"),
        (F.abs(hll_est - F.col("__nd").cast("double")) <= tol(F.col("__nd")))
        .alias("ok"),
    )
    dk = d.select("lang", "k").distinct().localCheckpoint()
    ex_inter = (
        dk.alias("x")
        .join(
            dk.alias("y"),
            (F.col("y.k") == F.col("x.k"))
            & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(
            F.col("x.lang").alias("ga"), F.col("y.lang").alias("gb")
        )
        .agg(F.countDistinct("x.k").alias("__i"))
    )
    ov = overlap_estimates(sk)
    pair_rows = (
        ov.join(
            ex_inter,
            (ov["group_a"] == ex_inter["ga"]) & (ov["group_b"] == ex_inter["gb"]),
            "left",
        )
        .select(
            F.lit("sketch_ov").alias("sop"),
            F.concat("group_a", F.lit("|"), "group_b").alias("grp"),
            F.lit(None).cast("bigint").alias("n"),
            F.coalesce("__i", F.lit(0)).cast("bigint").alias("exact_parts"),
            (
                F.abs(F.col("inter") - F.coalesce("__i", F.lit(0)).cast("double"))
                <= tol(F.coalesce("__i", F.lit(0)))
            ).alias("ok"),
        )
    )
    # merge-only reads (bounded driver scalars) + their exact counterparts.
    # Round 18: the union estimate and the merged-KLL median come from ONE
    # aggregate job over the 4-row sketch checkpoint (was two, each its
    # own job — same merge semantics, same library functions' SQL); the
    # exact global distinct re-derives from the ALREADY-materialized
    # distinct (lang, k) frame instead of re-scanning documents.
    _require_sketch_functions(
        spark,
        [
            "hll_union_agg", "hll_sketch_estimate",
            "kll_merge_agg_double", "kll_sketch_get_quantile_double",
        ],
    )
    mrow = (
        sk.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias("u"),
            F.expr("kll_merge_agg_double(kll)").alias("m"),
        )
        .select(
            "u",
            F.expr(
                "kll_sketch_get_quantile_double(m, CAST(0.5 AS DOUBLE))"
            ).alias("q"),
        )
        .collect()[0]
    )
    u_est = int(mrow["u"])
    q50_est = mrow["q"]
    exact_all = dk.select("k").distinct().count()
    # Exact discrete median WITHOUT a global single-partition sort window
    # (the one banned plan shape — see tests/test_plan_contracts.py): a
    # map-side-combined value histogram is collected instead.  The driver
    # row count is O(distinct n_chars) — bounded by the value DOMAIN (a
    # document-length histogram), independent of corpus row count, the
    # same bounded-collect class as column_profile.
    hist = sorted(
        (
            (r["n_chars"], int(r["__c"]))
            for r in d.groupBy("n_chars")
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        ),
        # NULLS FIRST, matching the replaced window's ascending order
        key=lambda t: (t[0] is not None, t[0] if t[0] is not None else 0),
    )
    total = sum(c for _, c in hist)
    rank = (total + 1) // 2  # value at rank ⌈n/2⌉, as before
    seen = 0
    for v, c in hist:
        seen += c
        if seen >= rank:
            exact_med = int(v)
            break
    scalars = spark.createDataFrame(
        [
            (
                "sketch_u",
                "__union__",
                None,
                int(exact_all),
                bool(
                    abs(u_est - exact_all)
                    <= max(SKETCH_REL_ERR * exact_all, 1.0)
                ),
            ),
            (
                "sketch_q",
                "__all__",
                None,
                exact_med,
                bool(abs(q50_est - exact_med) <= SKETCH_Q_REL_ERR * exact_med),
            ),
        ],
        "sop string, grp string, n long, exact_parts long, ok boolean",
    )
    return per_group.unionByName(pair_rows).unionByName(scalars)


def merged_quantiles(sketches: DataFrame, probs) -> list:
    """Quantiles of the merged KLL sketch across all rows — e.g. the p50/p99
    document length over every epoch, from artifacts only.  The merge runs
    ONCE (one ``kll_merge_agg_double``), then each probability is a scalar
    query against the merged sketch."""
    _require_sketch_functions(
        sketches.sparkSession,
        ["kll_merge_agg_double", "kll_sketch_get_quantile_double"],
    )
    merged = sketches.agg(F.expr("kll_merge_agg_double(kll)").alias("m"))
    row = merged.select(
        *[
            F.expr(
                f"kll_sketch_get_quantile_double(m, CAST({float(p)} AS DOUBLE))"
            ).alias(f"q{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    return [row[f"q{i}"] for i in range(len(probs))]
