"""The flagship query: Layer-A schema inference applied to a real column —
``events.props`` (a JSON string column) → inferred Hive types per field.

This is the reference's entire purpose (NDJSON → strictest Hive schema,
``/root/reference/Schemer.scala``) running as a distributed aggregation over
a DataFrame column.  The oracle reproduces the integer-ladder lattice rule
(``Schemer.scala:77-81`` + our min/max deviation) in pure SQL for the shape
this column actually has — an independent re-derivation, not a re-run of our
own code.
"""

from __future__ import annotations

from ..registry import query
from ..schema_infer import infer_json_column, render_type
from ..sources.tables import load_table


@query(
    "infer_props_schema",
    oracle="""
    SELECT 'k' AS field,
           CASE
             WHEN min_v >= -128 AND max_v <= 127 THEN 'TINYINT'
             WHEN min_v >= -32768 AND max_v <= 32767 THEN 'SMALLINT'
             WHEN min_v >= -2147483648 AND max_v <= 2147483647 THEN 'INT'
             ELSE 'BIGINT'
           END AS hive_type
    FROM (SELECT MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_v,
                 MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_v
          FROM events WHERE props IS NOT NULL)
    ORDER BY field
    """,
)
def infer_props_schema(spark, sf_dir):
    """Infer the lattice schema of ``events.props`` → one row per top-level
    field with its Hive type string.

    Scale: the inference is a partial/final aggregation (mapInPandas fold →
    driver merge of one tiny descriptor per partition) — the same shape as
    any distributive agg, so it scales like a COUNT, not like a collect."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    desc = infer_json_column(e, "props", permissive=False)
    # The result is a handful of driver-side rows: sort in Python and emit
    # an Arrow-backed LocalRelation (collect needs ZERO jobs).  The previous
    # list-based createDataFrame + .orderBy cost a 32-slice parallelize, a
    # range-partitioner sampling job, and an exchange — measured 0.67 s of
    # the query's 0.90 s at sf0.1 (the r6 bench drift) — to sort rows
    # already in hand on the driver.
    rows = sorted((k, render_type(v)) for k, v in desc.fields.items())
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["field", "hive_type"]),
        "field string, hive_type string",
    )
