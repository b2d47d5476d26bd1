"""Round-17 localization layer for the packing-family slots (VERDICT r16
#1): per-arm digest rows, cross-engine digest parity, and robustness of
the slot output to session partitioning — the three properties that let a
driver-side hash mismatch be pinned to an exact arm (or to the driver's
own hasher) instead of hiding inside a merged multiset.
"""

from __future__ import annotations

import duckdb
import pytest

from hive_serde_schema_gen_spark.operators.packing import (
    PACK_SCHEMA,
    _digest_rows_spark,
    _sql_digest_arm,
    _with_digest_rows,
    packing_ops,
)


def _mk(spark, rows):
    from hive_serde_schema_gen_spark.functions.union import pad_union

    df = spark.createDataFrame(
        rows, "op string, doc_id long, split string"
    )
    return pad_union(
        PACK_SCHEMA,
        (df, {"op": "op", "doc_id": "doc_id", "split": "split"}),
    )


def test_digest_matches_duckdb_formula(spark):
    """The Spark digest triple equals a DuckDB evaluation of
    _sql_digest_arm over the same canonically-serialized rows — the
    parity that makes 'all digests green + slot red' implicate the
    driver's hasher rather than any arm."""
    rows = [
        ("a", 1, "x"), ("a", 2, None), ("a", None, "y"), ("b", 7, "z"),
    ]
    res = _mk(spark, rows)
    got = {
        r["op"]: (r["n_rows"], r["xor60"], r["sum32"])
        for r in _digest_rows_spark(res).collect()
    }

    con = duckdb.connect()
    cols = ", ".join(f'"{c}" ' for c, _ in PACK_SCHEMA)
    values = []
    for op, doc_id, split in rows:
        values.append(
            "("
            + ", ".join(
                [
                    f"'{op}'",
                    "NULL" if doc_id is None else str(doc_id),
                    "CAST(NULL AS INTEGER)",
                    "CAST(NULL AS BIGINT)",
                    "CAST(NULL AS BIGINT)",
                    "CAST(NULL AS BIGINT)",
                    "CAST(NULL AS INTEGER)",
                    "NULL" if split is None else f"'{split}'",
                    "CAST(NULL AS BIGINT)",
                    "CAST(NULL AS INTEGER)",
                ]
            )
            + ")"
        )
    names = ", ".join(f'"{c}"' for c, _ in PACK_SCHEMA)
    sql = (
        f"WITH __parts({names}) AS (VALUES {', '.join(values)}) "
        + _sql_digest_arm()
    )
    want = {
        r[7]: (r[1], r[8], r[3]) for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_digest_names_a_tampered_arm(spark):
    """Flip one value in one arm: only that arm's digest row changes —
    the property that makes a red slot self-localizing."""
    base = _mk(spark, [("a", 1, "x"), ("a", 2, "y"), ("b", 7, "z")])
    tampered = _mk(spark, [("a", 1, "x"), ("a", 2, "Y"), ("b", 7, "z")])
    d0 = {r["op"]: (r["xor60"], r["sum32"])
          for r in _digest_rows_spark(base).collect()}
    d1 = {r["op"]: (r["xor60"], r["sum32"])
          for r in _digest_rows_spark(tampered).collect()}
    assert d0["b"] == d1["b"]
    assert d0["a"] != d1["a"]


def test_with_digest_rows_appends_one_row_per_arm(spark):
    res = _with_digest_rows(
        _mk(spark, [("a", 1, "x"), ("a", 2, "y"), ("b", 7, "z")])
    )
    dig = [r for r in res.collect() if r["op"] == "digest"]
    assert sorted(r["split"] for r in dig) == ["a", "b"]
    # doc_id carries the arm's row count
    assert {r["split"]: r["doc_id"] for r in dig} == {"a": 2, "b": 1}


@pytest.mark.parametrize("shuffle_partitions", ["3", "64"])
def test_packing_ops_invariant_under_session_partitioning(
    spark, sf_dir, shuffle_partitions
):
    """The slot's full row multiset (digests included) must be a pure
    function of the data — never of spark.sql.shuffle.partitions or
    parallelism.  A partition-dependent value would explain a driver-red
    /judge-green divergence; this pins it down locally."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_partitions)
        got = sorted(
            tuple(r) for r in packing_ops(spark, sf_dir).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    ref = sorted(tuple(r) for r in packing_ops(spark, sf_dir).collect())
    assert got == ref
