"""Single-pass data-quality validation (the Deequ/Great-Expectations step a
production pipeline runs between every two stages): declarative constraints
— completeness, uniqueness, ranges, predicates, row count — compiled into
ONE aggregate job over the data, however many checks are registered.

Scale design: every constraint lowers to a map-side-combinable aggregate
expression (avg of a 0/1 indicator, min/max, count, approx_count_distinct),
so N checks cost one pass and one 1-row shuffle — never N jobs.  Exact
uniqueness (``approx=False``) is the one exception worth knowing about:
multiple exact count-distincts make Catalyst plan an Expand (one input-row
replica per distinct column), so at 100 TB keep uniqueness checks on the
default HyperLogLog estimate (rsd 1.5%) and reserve exact mode for
small/keyed relations.  The metrics row is O(checks) — collecting it is
driver-bounded regardless of data size.

(The reference has no validation surface — ``Schemer.scala`` rejects rows
only on type conflicts; this module is engine-side pipeline machinery.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import query


@dataclass(frozen=True)
class Check:
    """One constraint: ``metric`` (an aggregate Column), compared with
    ``op`` against ``threshold``.  Use the factory functions below."""

    name: str
    metric: object  # Column
    op: str  # ">=", "<=", "=="
    threshold: float


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with ``col`` non-null >= min_ratio."""
    return Check(
        f"completeness({col})>={min_ratio}",
        F.avg(F.col(col).isNotNull().cast("double")),
        ">=",
        min_ratio,
    )


def uniqueness(col: str, min_ratio: float = 1.0, approx: bool = True) -> Check:
    """distinct(col)/count >= min_ratio.  ``approx`` (default) uses
    HyperLogLog — the 100-TB configuration; exact mode plans an Expand."""
    d = F.approx_count_distinct(col) if approx else F.countDistinct(col)
    return Check(
        f"uniqueness({col})>={min_ratio}",
        d.cast("double") / F.count(F.lit(1)),
        ">=",
        min_ratio,
    )


def in_range(col: str, lo: float, hi: float, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values inside [lo, hi] >= min_ratio (a null
    neither passes nor fails the range — pair with ``completeness``)."""
    ok = F.col(col).between(lo, hi).cast("double")
    return Check(
        f"in_range({col},[{lo},{hi}])>={min_ratio}",
        F.coalesce(F.avg(ok), F.lit(1.0)),
        ">=",
        min_ratio,
    )


def satisfies(predicate: str, min_ratio: float = 1.0, name: str | None = None) -> Check:
    """Fraction of rows satisfying a SQL predicate >= min_ratio (nulls fail:
    a predicate you can't evaluate is not satisfied)."""
    ok = F.coalesce(F.expr(predicate).cast("double"), F.lit(0.0))
    return Check(
        name or f"satisfies({predicate})>={min_ratio}", F.avg(ok), ">=", min_ratio
    )


def row_count(min_rows: int = 1, max_rows: float = float("inf")) -> list:
    """Row count within [min_rows, max_rows] — the empty-upstream /
    runaway-join canary.  Returns two checks."""
    cnt = F.count(F.lit(1)).cast("double")
    out = [Check(f"row_count>={min_rows}", cnt, ">=", float(min_rows))]
    if max_rows != float("inf"):
        out.append(Check(f"row_count<={max_rows}", cnt, "<=", float(max_rows)))
    return out


def matches_regex(col: str, pattern: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values matching ``pattern`` >= min_ratio."""
    ok = F.col(col).rlike(pattern).cast("double")
    return Check(
        f"matches_regex({col})>={min_ratio}",
        F.coalesce(F.avg(ok), F.lit(1.0)),
        ">=",
        min_ratio,
    )


_OPS = {
    ">=": lambda m, t: m >= t,
    "<=": lambda m, t: m <= t,
    "==": lambda m, t: m == t,
}


def _flatten(checks) -> list:
    out = []
    for c in checks:
        out.extend(c) if isinstance(c, list) else out.append(c)
    return out


def metrics_frame(df: DataFrame, checks) -> DataFrame:
    """The ONE-row DataFrame of all check metrics (columns ``m0..mN``) —
    the single aggregate pass ``validate`` collects; exposed so harnesses
    (scale_check) can measure the pass without the driver round-trip."""
    checks = _flatten(checks)
    return df.agg(
        *[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)]
    )


def validate(df: DataFrame, checks) -> list:
    """Run all checks in one aggregate pass.  Returns a list of result dicts
    ``{name, metric, op, threshold, passed}`` (driver-side: the metrics row
    is O(checks), never O(rows))."""
    checks = _flatten(checks)
    if not checks:
        return []
    row = metrics_frame(df, checks).collect()[0]
    results = []
    for i, c in enumerate(checks):
        m = row[f"m{i}"]
        passed = m is not None and bool(_OPS[c.op](m, c.threshold))
        results.append(
            {
                "name": c.name,
                "metric": m,
                "op": c.op,
                "threshold": c.threshold,
                "passed": passed,
            }
        )
    return results


class ValidationError(AssertionError):
    def __init__(self, failures):
        self.failures = failures
        lines = ", ".join(
            f"{f['name']} (metric={f['metric']})" for f in failures
        )
        super().__init__(f"{len(failures)} check(s) failed: {lines}")


def expect(df: DataFrame, checks) -> list:
    """``validate`` + raise :class:`ValidationError` when any check fails —
    the form a pipeline wires between stages."""
    results = validate(df, checks)
    failures = [r for r in results if not r["passed"]]
    if failures:
        raise ValidationError(failures)
    return results


def metric_anomalies(
    reports: DataFrame,
    k: float = 3.0,
    min_history: int = 5,
    window: int = 100,
    exact_int: bool = False,
) -> DataFrame:
    """Anomalous epochs in a quality-gate report table (the
    ``streaming/quality_gate`` output): for each check, flag epochs whose
    metric deviates more than ``k`` trailing standard deviations from the
    trailing mean — the drift detector that catches a metric that still
    PASSES its threshold but has shifted regime (completeness sliding
    0.999 → 0.991 is invisible to a 0.99 threshold and screams here).

    Output: ``(check, epoch, metric, trail_mean, trail_std, z)`` for
    flagged rows only.  Trailing window = previous ``window`` epochs per
    check (never the current row — a spike must not mask itself), with at
    least ``min_history`` observations before anything is flagged.  One
    window shuffle partitioned by check — the report table is O(epochs ×
    checks), metadata-sized at any corpus scale.

    ``exact_int=True`` (round 12): for INTEGER metric columns (epoch row
    counts, distinct counts), the trailing moments derive from windowed
    integer SUM / SUM-of-squares instead of float avg/stddev — the sums
    are exact under any evaluation order (DuckDB's segment-tree moving
    aggregates reassociate float additions, which kept the float path
    out of the oracle gate), and mean/std/z follow as one fixed double
    expression, so flagged rows are bit-identical cross-engine.
    Positivity of the variance is pre-tested as the exact integer
    ``n·Σx² − (Σx)² > 0`` so no division or sqrt ever sees a degenerate
    window (ANSI-safe)."""
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("check")
        .orderBy("epoch")
        .rowsBetween(-window, -1)
    )
    if exact_int:
        # Moments in decimal, not long: with window=100, (Σx)² and n·Σx²
        # overflow int64 once metrics reach ~3e7 (epoch row counts at
        # pipeline scale), and non-ANSI Spark wraps silently — flipping
        # the positivity test.  DuckDB promotes SUM(BIGINT) to HUGEINT,
        # so decimal(38,0) keeps the two engines exact-identical up to
        # metrics ~1e14 (s1² ≤ 1e32 < 1e38).
        md = F.col("metric").cast("decimal(18,0)")
        s1 = F.sum(md).over(w)
        s2 = F.sum(md * md).over(w)
        nn = F.count("metric").over(w)
        base = reports.select(
            "check", "epoch", "metric",
            s1.alias("__s1"), s2.alias("__s2"), nn.alias("__n"),
        ).filter(
            (F.col("__n") >= F.lit(int(max(min_history, 2))))
            # exact integer variance-positivity: n·Σx² − (Σx)² > 0,
            # evaluated in decimal(38,0) (never wraps below 1e38)
            & (
                F.col("__n").cast("decimal(20,0)") * F.col("__s2")
                - F.col("__s1") * F.col("__s1")
                > 0
            )
        )
        s1d = F.col("__s1").cast("double")
        mean = s1d / F.col("__n")
        std = F.sqrt(
            (F.col("__s2").cast("double") - s1d * s1d / F.col("__n"))
            / (F.col("__n") - 1)
        )
        zx = (F.col("metric") - mean) / std
        return (
            base.select(
                "check", "epoch", "metric",
                mean.alias("trail_mean"), std.alias("trail_std"),
                zx.alias("z"),
            )
            .filter(F.abs(F.col("z")) > k)
        )
    scored = reports.select(
        "check",
        "epoch",
        "metric",
        F.avg("metric").over(w).alias("trail_mean"),
        F.stddev("metric").over(w).alias("trail_std"),
        F.count("metric").over(w).alias("__n"),
    )
    z = (F.col("metric") - F.col("trail_mean")) / F.col("trail_std")
    return (
        scored.filter(
            (F.col("__n") >= min_history)
            & F.col("trail_std").isNotNull()
            & (F.col("trail_std") > 0)
            & (F.abs(z) > k)
        )
        .select("check", "epoch", "metric", "trail_mean", "trail_std", z.alias("z"))
    )


# ---------------------------------------------------------------------------
# Round-8 driver-oracle slot
# ---------------------------------------------------------------------------


def _driver_checks():
    """The fixed check list of the ``validation_checks`` slot.  Exact
    uniqueness (not the HLL default) on purpose: the driver hash-compares
    values, and countDistinct/count is bit-exact in both engines."""
    return [
        completeness("text"),
        completeness("lang"),
        uniqueness("doc_id", approx=False),
        in_range("n_chars", 1, 100000),
        satisfies("n_chars = length(text)", name="satisfies(n_chars=length)"),
        matches_regex("lang", "^[a-z]{2}$"),
        row_count(min_rows=1),
    ]


# op='anomaly' configuration (round 12 — the metric_anomalies exact-int
# mode joins the oracle gate): per-event-type epoch row counts with a
# planted spike every 37th epoch, z-scored against a trailing window.
ANOM_EPOCH_DIV = 100
ANOM_SPIKE_MOD, ANOM_SPIKE_REM, ANOM_SPIKE = 37, 11, 40
ANOM_K, ANOM_MIN_HIST, ANOM_WINDOW = 3.0, 5, 20


def anomaly_evidence_frame(spark, sf_dir):
    """Driver branch for :func:`metric_anomalies` (exact-int mode): the
    report series is events-per-epoch per event_type (epoch = event_id
    DIV {div}), an integer metric, with +{spike} planted on every epoch
    ≡ {rem} (mod {mod}) — a regime spike the trailing z-score must flag.
    The construction, the windowed integer moments, and the flagged rows
    are all re-derived in SQL.""".format(
        div=ANOM_EPOCH_DIV, spike=ANOM_SPIKE,
        rem=ANOM_SPIKE_REM, mod=ANOM_SPIKE_MOD,
    )
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rep = (
        ev.groupBy(
            F.col("event_type").alias("check"),
            F.expr(f"event_id DIV {ANOM_EPOCH_DIV}").alias("epoch"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "check",
            "epoch",
            (
                F.col("__c")
                + F.when(
                    F.col("epoch") % ANOM_SPIKE_MOD == ANOM_SPIKE_REM,
                    F.lit(ANOM_SPIKE),
                ).otherwise(F.lit(0))
            ).cast("long").alias("metric"),
        )
    )
    return metric_anomalies(
        rep, k=ANOM_K, min_history=ANOM_MIN_HIST, window=ANOM_WINDOW,
        exact_int=True,
    )


_ANOM_SQL = f"""
    WITH arep AS (
      SELECT event_type AS achk, event_id // {ANOM_EPOCH_DIV} AS epoch,
             CAST(COUNT(*)
                  + CASE WHEN (event_id // {ANOM_EPOCH_DIV})
                              % {ANOM_SPIKE_MOD} = {ANOM_SPIKE_REM}
                         THEN {ANOM_SPIKE} ELSE 0 END AS BIGINT) AS metric
      FROM events GROUP BY event_type, event_id // {ANOM_EPOCH_DIV}),
    awin AS (
      SELECT achk, epoch, metric,
             SUM(metric) OVER w AS s1,
             SUM(metric * metric) OVER w AS s2,
             COUNT(metric) OVER w AS n
      FROM arep
      WINDOW w AS (PARTITION BY achk ORDER BY epoch
                   ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)),
    abase AS (
      SELECT achk, epoch, metric,
             CAST(s1 AS DOUBLE) / n AS trail_mean,
             sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) AS trail_std
      FROM awin
      WHERE n >= {ANOM_MIN_HIST} AND n * s2 - s1 * s1 > 0),
    aflag AS (
      SELECT achk, epoch, metric, trail_mean, trail_std,
             (metric - trail_mean) / trail_std AS z
      FROM abase)
    SELECT achk, epoch, metric, trail_mean, trail_std, z
    FROM aflag WHERE abs(z) > {ANOM_K}
"""


@query(
    "validation_checks",
    oracle=f"""
    SELECT * FROM (
    SELECT 'completeness(text)>=1.0' AS "check",
           AVG(CAST(text IS NOT NULL AS DOUBLE)) AS metric,
           CAST(NULL AS BIGINT) AS epoch,
           CAST(NULL AS DOUBLE) AS trail_mean,
           CAST(NULL AS DOUBLE) AS trail_std,
           CAST(NULL AS DOUBLE) AS z
    FROM documents
    UNION ALL
    SELECT 'completeness(lang)>=1.0',
           AVG(CAST(lang IS NOT NULL AS DOUBLE)), NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'uniqueness(doc_id)>=1.0',
           CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(*),
           NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'in_range(n_chars,[1,100000])>=1.0',
           COALESCE(AVG(CAST(n_chars BETWEEN 1 AND 100000 AS DOUBLE)), 1.0),
           NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'satisfies(n_chars=length)',
           AVG(COALESCE(CAST(n_chars = LENGTH(text) AS DOUBLE), 0.0)),
           NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'matches_regex(lang)>=1.0',
           COALESCE(AVG(CAST(regexp_matches(lang, '^[a-z]{{2}}$') AS DOUBLE)), 1.0),
           NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'row_count>=1', CAST(COUNT(*) AS DOUBLE), NULL, NULL, NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'anomaly(' || achk || ')', CAST(metric AS DOUBLE),
           epoch, trail_mean, trail_std, z
    FROM ({_ANOM_SQL})
    ) ORDER BY "check", COALESCE(epoch, -1)
    """,
)
def validation_checks(spark, sf_dir):
    """Driver slot for the round-7 declarative validation layer: the REAL
    ``metrics_frame`` single-aggregate pass over ``documents`` (seven
    constraint families — completeness, exact uniqueness, range,
    predicate, regex, row count — lowered into ONE HashAggregate pair),
    stacked to tidy ``(check, metric)`` rows.  Every metric is an exact
    ratio of integer counts (order-free), so the driver hash-compares
    doubles bit-for-bit against the oracle's independent SQL aggregates.

    Round-12 continuation: op rows 'anomaly(<event_type>)' pin
    :func:`metric_anomalies` in its exact-int mode over the planted
    epoch-count series (:func:`anomaly_evidence_frame`) — trailing
    integer moments, the variance-positivity cut, and each flagged
    epoch's (metric, trail_mean, trail_std, z) all ride the hash."""
    from ..functions.union import pad_union
    from ..sources.tables import load_table

    checks = _flatten(_driver_checks())
    d = load_table(spark, sf_dir, "documents")
    mf = metrics_frame(d, checks)
    pairs = []
    for i, c in enumerate(checks):
        pairs.extend([F.lit(c.name), F.col(f"m{i}")])
    base = mf.select(
        F.stack(F.lit(len(checks)), *pairs).alias("check", "metric")
    )
    anom = anomaly_evidence_frame(spark, sf_dir).select(
        F.concat(F.lit("anomaly("), F.col("check"), F.lit(")")).alias(
            "check"
        ),
        F.col("metric").cast("double").alias("metric"),
        "epoch", "trail_mean", "trail_std", "z",
    )
    schema = [
        ("check", "string"), ("metric", "double"), ("epoch", "bigint"),
        ("trail_mean", "double"), ("trail_std", "double"), ("z", "double"),
    ]
    return pad_union(
        schema,
        (base, {"check": "check", "metric": "metric"}),
        (
            anom,
            {
                "check": "check", "metric": "metric", "epoch": "epoch",
                "trail_mean": "trail_mean", "trail_std": "trail_std",
                "z": "z",
            },
        ),
    ).orderBy("check", F.coalesce("epoch", F.lit(-1)))
