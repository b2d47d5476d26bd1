"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

``F.aggregate`` / ``F.zip_with`` keep the arithmetic inside whole-stage
codegen (a row-at-a-time Python UDF here would be 10-100× slower and break
the codegen span).  Folds are sequential left-to-right, so results are
deterministic per row.  Elements are cast to double before arithmetic so
precision does not depend on float promotion rules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Dot product of two array<float|double> columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
