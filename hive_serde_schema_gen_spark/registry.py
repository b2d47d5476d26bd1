"""Query registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each operator registers a (name → Spark callable, optional DuckDB oracle SQL)
pair with the :func:`query` decorator, keeping the Spark plan and its oracle
side by side in the operator's own module.  Importing the operator modules
populates the registry.

Cross-engine determinism rules (why the SQL sometimes looks overdressed):

- The driver hash-compares VALUES, so floating-point aggregation order must
  not matter.  Sums of integral-valued doubles (``l_quantity``) are exact in
  IEEE754 and safe; sums of monetary doubles are NOT — both sides cast to
  DECIMAL per row, aggregate exactly, and cast the final result to double.
- Per-row arithmetic (no reduction) is deterministic in both engines.
- Column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
- Timestamps: every callable pins the session timezone to UTC (the driver's
  session may differ); outputs derived from timestamps are emitted as
  strings/ints (``date_format``/``year``), never raw timestamps.
- Ties: every ORDER BY carries a unique tiebreaker key so LIMIT/top-k is
  well-defined in both engines.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: Dict[str, QueryFn] = {}
_ORACLES: Dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query; ``oracle=None`` means non-SQL-expressible (the
    driver then records a weaker rows-only check — keep these rare)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Defensive: the driver's session conf is not ours to assume.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        # return the wrapper so direct module-level calls also get the
        # session-conf pin, not just the registry path
        return wrapped

    return deco


def all_queries() -> Dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> Dict[str, str]:
    _load()
    return dict(_ORACLES)


_loaded = False


def _load() -> None:
    """Import every operator module for its registration side effects."""
    global _loaded
    if _loaded:
        return
    # Registration order = driver evaluation order; the harness evaluates at
    # most 50 entries, so the registry holds exactly 50 and the families
    # whose evidence matters most register first.
    from .operators import text  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .streaming import windows  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import clustering  # noqa: F401
    from .operators import packing  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import inference  # noqa: F401
    from .operators import advanced  # noqa: F401
    from .operators import relational  # noqa: F401
    from .operators import graph  # noqa: F401
    from .operators import validation  # noqa: F401
    from .operators import curation  # noqa: F401
    from .operators import html  # noqa: F401
    from .operators import embedding  # noqa: F401
    from .operators import text_index  # noqa: F401
    from .operators import hybrid  # noqa: F401
    from .operators import lm  # noqa: F401

    _loaded = True
