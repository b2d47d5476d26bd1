"""Storage-layout tests: partition pruning and bucketed shuffle-free joins —
the write-side levers that make 100 TB plans cheap (guide: "Partitioning &
shuffle")."""

import pytest
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.plans import explain_str
from hive_serde_schema_gen_spark.sources.readers import read_csv, read_orc, read_xml
from hive_serde_schema_gen_spark.sources.sinks import write_bucketed, write_partitioned
from hive_serde_schema_gen_spark.sources.tables import load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_partitioned(o, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(back)
    # partition filter handled at planning: no pushed data filter needed and
    # only the matching directory is read
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    want = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key: the join plans with ZERO
    Exchange operators — the write-time shuffle replaces every future
    read-time shuffle."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(l, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = explain_str(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, plan
        # and it computes the same thing as the unbucketed join
        want = (
            o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        assert got == {r["o_orderstatus"]: r["count"] for r in want.collect()}
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_csv_and_orc_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    orc_path = str(tmp_path / "nation_orc")
    n.write.mode("overwrite").option("header", "true").csv(csv_path)
    n.write.mode("overwrite").orc(orc_path)
    assert read_csv(spark, csv_path, schema=n.schema).count() == n.count()
    back = read_orc(spark, orc_path)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in n.collect()
    )


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    xml_path = str(tmp_path / "nation_xml")
    n.write.mode("overwrite").format("xml").option("rowTag", "nation").save(xml_path)
    back = read_xml(spark, xml_path, row_tag="nation", schema=n.schema)
    # full-row comparison (same column order) — a name-only check would
    # miss numeric columns silently nulled by schema coercion
    cols = n.columns
    assert sorted(tuple(r) for r in back.select(*cols).collect()) == sorted(
        tuple(r) for r in n.collect()
    )


def test_jdbc_clear_error_without_driver(spark):
    from hive_serde_schema_gen_spark.sources.readers import read_jdbc

    with pytest.raises(RuntimeError, match="JDBC driver jar"):
        read_jdbc(spark, "jdbc:postgresql://localhost/nope", "t")
