"""Unit tests for token-stream packing edge cases — in particular the
empty-document chunk convention, where naive floor-vs-truncate division
divergence between engines (Spark floor(-1/L) = -1, DuckDB -1 // L = 0)
would silently break the oracle if the convention weren't explicit."""

from __future__ import annotations

import duckdb

from hive_serde_schema_gen_spark.operators.packing import (
    SPLIT_FRACTIONS,
    _sql_chunk_split_cols,
    assign_split,
    chunk_token_stream,
)

DOCS = [(0, ""), (1, "a b c"), (2, "   "), (3, "d e"), (4, "x")]
L = 2  # tiny context window so docs straddle boundaries


def _spark_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = assign_split(chunk_token_stream(docs, L), SPLIT_FRACTIONS)
    return sorted(tuple(r) for r in out.collect())


def test_empty_doc_convention_and_offsets(spark):
    rows = {r[0]: r for r in _spark_rows(spark)}
    # empty / whitespace-only docs: 0 tokens, 0 chunks, chunk_last just
    # below chunk_first — including the doc at offset 0 (the engine-
    # divergent case)
    for empty_id in (0, 2):
        _, n_tokens, _, first, last, n_chunks, _ = rows[empty_id]
        assert n_tokens == 0 and n_chunks == 0
        assert last == first - 1
    # offsets: empty docs consume no token slots
    assert rows[1][2] == 0  # doc 1 starts the stream
    assert rows[3][2] == 3  # doc 3 follows doc 1's three tokens
    assert rows[4][2] == 5
    # doc 3 (2 tokens at offset 3, L=2) straddles chunks 1 and 2
    assert (rows[3][3], rows[3][4], rows[3][5]) == (1, 2, 2)


def test_cross_engine_chunk_and_split_math(spark):
    """The exact oracle fragment over the same synthetic docs must match the
    Spark output row-for-row — the regression net for the floor/truncate
    divergence on empty docs at offset 0."""
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) t(doc_id, text)"
    )
    sql = f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(TRIM(text), '\\s+'),
                                  t -> t <> '')) AS INTEGER) AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS "offset"
      FROM tok)
    SELECT doc_id, n_tokens, "offset", {_sql_chunk_split_cols(L)}
    FROM cum ORDER BY doc_id
    """
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    got = [tuple(str(v) for v in r) for r in _spark_rows(spark)]
    assert got == [tuple(str(v) for v in r) for r in want]
