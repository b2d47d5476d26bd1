"""Tagged-union plumbing for the merged registry slots.

The round-8 slot merges (``scalar_funcs``, ``window_analytics``,
``join_variants``, ``stats_summary``, ``dedup_simhash``) all union
differently-shaped component results into one frame by null-padding each
side to a shared schema.  Hand-writing the padding per site is how
columns drift out of alignment — ``pad_union`` makes the shared schema
the single declaration and fills everything a component doesn't supply
with a typed NULL, so a mismatch is impossible by construction (a
component naming a column outside the schema raises immediately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pad_union(schema: list, *parts) -> DataFrame:
    """Union ``parts`` over the declared ``schema``.

    ``schema``: ordered ``(name, sql_type)`` pairs — the output columns.
    Each part is ``(df, mapping)`` where ``mapping`` maps a schema column
    name to a Column (or an existing column name) on that part; schema
    columns absent from the mapping become ``CAST(NULL AS sql_type)``.
    Column order and types are therefore identical across every branch —
    the property ``unionAll`` silently mis-aligns on when padded by hand.
    """
    names = [n for n, _ in schema]
    frames = []
    for df, mapping in parts:
        unknown = set(mapping) - set(names)
        if unknown:
            raise ValueError(f"mapping names outside the schema: {sorted(unknown)}")
        cols = []
        for name, typ in schema:
            if name in mapping:
                v = mapping[name]
                # cast to the DECLARED type: without it a component
                # supplying e.g. int where the schema says bigint would
                # either fail the union or let set-operation widening
                # silently override the declaration
                cols.append(
                    (F.col(v) if isinstance(v, str) else v)
                    .cast(typ)
                    .alias(name)
                )
            else:
                cols.append(F.lit(None).cast(typ).alias(name))
        frames.append(df.select(*cols))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out
