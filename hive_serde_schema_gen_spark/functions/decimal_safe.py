"""Exact-decimal helpers for cross-engine-deterministic aggregation.

Floating-point SUM/AVG depend on reduction order, which differs between
Spark's partial aggregation and any oracle engine — and between two Spark
runs with different partitioning.  Casting monetary doubles to DECIMAL per
row (which exactly recovers the intended 2-decimal values) makes the
aggregation exact and order-independent; the final cast back to double is
then bit-deterministic.  At scale this also means results don't drift when
partitioning changes — a property worth having at 100 TB, not just for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def one(scale: int = 2) -> Column:
    return F.lit(1).cast(f"decimal({scale + 1},{scale})")


def money_sum(col, precision: int = 12, scale: int = 2) -> Column:
    """Order-independent SUM of a monetary double column → double."""
    return F.sum(dec(col, precision, scale)).cast("double")
