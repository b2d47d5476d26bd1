"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke: Layer-A schema inference (the reference's
whole purpose, ``/root/reference/Schemer.scala``) applied to the
``events.props`` JSON column at sf0.001.

``queries()`` / ``oracle_sql()`` — the full operator surface, populated from
``hive_serde_schema_gen_spark.registry`` (each operator module registers its
Spark callable and DuckDB oracle side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_serde_schema_gen_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hive_serde_schema_gen_spark.registry import all_queries as _q

    return _q()["infer_props_schema"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (Layer A flagship
    + Layer B relational/dedup/similarity/text/multimodal/streaming)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query; entries
    without SQL equivalents (approximate LSH, stubbed decode) are omitted on
    purpose → the driver records rows-only checks for those."""
    return all_oracles()
