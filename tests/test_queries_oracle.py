"""The correctness gate, run locally: every registered query vs its DuckDB
oracle — row count, column names, and order-insensitive value equality —
mirroring the driver's CORRECTNESS check (BASELINE.md)."""

from __future__ import annotations

import math

import duckdb
import pytest

from hive_serde_schema_gen_spark.registry import all_oracles, all_queries
from hive_serde_schema_gen_spark.sources.tables import TABLES

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir_oracle):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir_oracle}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # full-precision compare: the engine's determinism rules
                    # (decimal aggregation, integer quantization) promise
                    # bit-identical doubles, so we assert them
                    vals.append(f"{v:.17g}")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir_oracle):
    sdf = QUERIES[name](spark, sf_dir_oracle)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    duck_res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in duck_res.description]
    drows = duck_res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sn, dn = normalize(srows), normalize(drows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir_oracle):
    sdf = QUERIES[name](spark, sf_dir_oracle)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_registry_holds_exactly_fifty_fully_oracled_slots():
    """The driver evaluates at most 50 entries and the project contract is
    ALL of them oracle-checked — a slot added without a merge (51) or an
    oracle dropped in a refactor must fail HERE, not in the driver run."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert len(qs) == 50, sorted(qs)
    assert set(os_) == set(qs), set(qs) ^ set(os_)
