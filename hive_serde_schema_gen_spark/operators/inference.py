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

from pyspark.sql import functions as F

from ..registry import query
from ..schema_infer import infer_json_column, render_type
from ..sources.tables import load_table

_INT_LADDER = """CASE
             WHEN min_v >= -128 AND max_v <= 127 THEN 'TINYINT'
             WHEN min_v >= -32768 AND max_v <= 32767 THEN 'SMALLINT'
             WHEN min_v >= -2147483648 AND max_v <= 2147483647 THEN 'INT'
             ELSE 'BIGINT'
           END"""


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


# structs_to_maps threshold for the driver slot — well under the 40
# planted keys, well over the 1-field props object.
MAPS_THRESHOLD = 16


def infer_maps_schema(spark, sf_dir):
    """The ``--infer-maps`` variant over a PLANTED key-as-data column:
    every events row contributes ``{"tags": {"t<event_id%40>": <v>}}`` with
    ``v = event_id % 2000 - 1000``, so the merged lattice sees a nested
    struct of 40 integer fields — exactly the per-user-dict shape whose
    key set never converges — and ``structs_to_maps`` (threshold 16)
    rewrites it to ``MAP<STRING, <unified int ladder>>``.  Same
    distributed fold as :func:`infer_props_schema`; the rewrite itself is
    a driver-side O(schema) pass over the merged descriptor."""
    import pandas as pd

    from ..schema_infer.lattice import structs_to_maps

    e = load_table(spark, sf_dir, "events")
    j = e.select(
        F.concat(
            F.lit('{"tags":{"t'),
            (F.col("event_id") % 40).cast("string"),
            F.lit('":'),
            (F.col("event_id") % 2000 - 1000).cast("string"),
            F.lit("}}"),
        ).alias("mj")
    )
    desc = structs_to_maps(
        infer_json_column(j, "mj", permissive=False), MAPS_THRESHOLD
    )
    rows = sorted((k, render_type(v)) for k, v in desc.fields.items())
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["field", "hive_type"]),
        "field string, hive_type string",
    )


@query(
    "infer_props_schema",
    oracle=f"""
    SELECT 'props' AS op, 'k' AS field,
           {_INT_LADDER} AS hive_type
    FROM (SELECT MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_v,
                 MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_v
          FROM events WHERE props IS NOT NULL)
    UNION ALL
    SELECT 'maps' AS op, 'tags' AS field,
           'MAP<STRING,' || chr(10) || chr(9) || {_INT_LADDER} || chr(10) || '>'
           AS hive_type
    FROM (SELECT MIN(event_id % 2000 - 1000) AS min_v,
                 MAX(event_id % 2000 - 1000) AS max_v
          FROM events)
    ORDER BY op, field
    """,
)
def infer_schema_slot(spark, sf_dir):
    """Driver slot: Layer-A inference in BOTH configurations as a tagged
    union — ``props`` rows are the flag-off reference-contract inference
    over ``events.props`` (:func:`infer_props_schema`, byte-identical to
    the pre-round-10 slot output minus the tag column), ``maps`` rows are
    the opt-in ``--infer-maps`` rewrite over the planted key-as-data
    object (:func:`infer_maps_schema`).  The oracle re-derives the MAP
    decision — the unified value ladder from the global min/max of the
    planted values, wrapped in the renderer's exact multi-line
    ``MAP<STRING, ...>`` spelling — so ``structs_to_maps``
    (``lattice.py``) is hash-checked under the driver gate, not just
    unit-tested."""
    from ..functions.union import pad_union

    schema = [("op", "string"), ("field", "string"), ("hive_type", "string")]
    return pad_union(
        schema,
        (
            infer_props_schema(spark, sf_dir),
            {"op": F.lit("props"), "field": "field", "hive_type": "hive_type"},
        ),
        (
            infer_maps_schema(spark, sf_dir),
            {"op": F.lit("maps"), "field": "field", "hive_type": "hive_type"},
        ),
    ).orderBy("op", "field")
