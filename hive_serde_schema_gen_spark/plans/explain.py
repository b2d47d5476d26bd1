"""Physical-plan introspection helpers.

The 100-TB posture of this engine is enforced, not hoped for: tests assert
that filters reach the parquet scan (``PushedFilters``), projections prune
(``ReadSchema``), structurally-small dims broadcast
(``BroadcastHashJoin``), top-k avoids full sorts (``TakeOrderedAndProject``)
and relational paths contain no Python-eval nodes (``BatchEvalPython`` /
``ArrowEvalPython`` would mean per-row Python in the hot loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same path .explain() uses
        df._jdf.queryExecution(), mode
    )


def has_node(df: DataFrame, node: str) -> bool:
    return node in explain_str(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the formatted plan (empty if none)."""
    return "\n".join(
        line for line in explain_str(df).splitlines() if "PushedFilters" in line
    )


def assert_no_python_udf(df: DataFrame) -> None:
    plan = explain_str(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        if bad in plan:
            raise AssertionError(f"Python eval node {bad} in plan:\n{plan}")
