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


# ---------------------------------------------------------------------------
# Document-local sliding-window chunking (RAG shape)
# ---------------------------------------------------------------------------


def test_chunk_documents_exact_windows(spark):
    from hive_serde_schema_gen_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(25)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["chunk_start"],
            r["n_chunk_tokens"],
            r["chunk_text"].split(),
        )
        for r in chunk_documents(df, chunk_tokens=10, overlap=3).collect()
    }
    # doc 1: 25 tokens, step 7 -> ceil((25-3)/7)=4 chunks at 0,7,14,21
    starts = [0, 7, 14, 21]
    assert sorted(k[1] for k in got if k[0] == 1) == [0, 1, 2, 3]
    for cid, st in enumerate(starts):
        s, n, t = got[(1, cid)]
        assert s == st and t == toks[st : st + 10] and n == len(t)
    # consecutive chunks overlap by exactly 3 tokens
    for cid in range(3):
        assert got[(1, cid)][2][-3:] == got[(1, cid + 1)][2][:3]
    # short docs: exactly one chunk, whole doc
    assert got[(2, 0)] == (0, 3, ["a", "b", "c"])
    assert got[(3, 0)] == (0, 1, ["solo"])
    # full coverage: union of chunks == the token set, in order
    merged = got[(1, 0)][2] + [
        tok for cid in range(1, 4) for tok in got[(1, cid)][2][3:]
    ]
    assert merged == toks


def test_chunk_documents_narrow_plan(spark, sf_dir):
    from hive_serde_schema_gen_spark.operators.packing import chunk_documents
    from hive_serde_schema_gen_spark.plans.explain import (
        assert_no_python_udf,
        explain_str,
    )
    from hive_serde_schema_gen_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    df = chunk_documents(d)
    assert_no_python_udf(df)
    assert "Exchange" not in explain_str(df)  # narrow: no shuffle
    # every document yields >= 1 chunk
    assert df.select("doc_id").distinct().count() == d.count()


def test_epoch_shuffle_deterministic_permutation(spark):
    from hive_serde_schema_gen_spark.operators.packing import epoch_shuffle

    d = spark.range(500).withColumnRenamed("id", "doc_id")
    e0a = [r["doc_id"] for r in epoch_shuffle(d, 0).collect()]
    e0b = [r["doc_id"] for r in epoch_shuffle(d, 0).collect()]
    e1 = [r["doc_id"] for r in epoch_shuffle(d, 1).collect()]
    assert e0a == e0b                       # same epoch -> identical order
    assert sorted(e0a) == list(range(500))  # a permutation, nothing lost
    assert e0a != e1                        # epochs differ
    assert sorted(e1) == list(range(500))
    assert e0a != list(range(500))          # actually shuffled


def test_epoch_shuffle_shards_stable_and_balanced(spark):
    from hive_serde_schema_gen_spark.operators.packing import epoch_shuffle

    d = spark.range(2000).withColumnRenamed("id", "doc_id")
    rows = epoch_shuffle(d, 3, n_shards=8).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["doc_id"])
    assert set(by_shard) == set(range(8))
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] > 150  # uniform hash -> no empty/starved shard
    # shard membership is a pure hash: a second run assigns identically
    again = {r["doc_id"]: r["shard"] for r in epoch_shuffle(d, 3, n_shards=8).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["shard"]
    # within each shard the rows follow the epoch hash order (toPandas
    # preserves partition-internal order), so partitionBy('shard') writes
    # reproduce the training order shard by shard
    import pyspark.sql.functions as F

    df = epoch_shuffle(d, 3, n_shards=8).withColumn(
        "__h", F.xxhash64(F.lit("shuffle-v1"), F.lit(3).cast("long"), F.col("doc_id"))
    )
    per_shard = {}
    for r in df.collect():
        per_shard.setdefault(r["shard"], []).append(r["__h"])
    for shard, hs in per_shard.items():
        assert hs == sorted(hs), f"shard {shard} not in hash order"


def test_packing_efficiency_zero_token_shard_emits_zero_not_null(spark):
    from hive_serde_schema_gen_spark.operators.packing import (
        packing_efficiency,
    )

    d = spark.createDataFrame(
        [(0, 10), (0, 20), (1, 0), (1, 0)], "shard int, n_tokens int"
    )
    rows = {r["shard"]: r for r in packing_efficiency(d, 64).collect()}
    z = rows["1"]
    assert (z["n_windows"], z["padded_windows"]) == (0, 0)
    # a metadata-only shard wastes nothing — 0.0, never NULL (0/0)
    assert z["packed_waste_frac"] == 0.0
    assert z["padded_waste_frac"] == 0.0
    assert rows["__total"]["packed_waste_frac"] is not None
