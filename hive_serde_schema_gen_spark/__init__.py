"""hive_serde_schema_gen_spark — a PySpark-native analytics engine.

Layer A (``schema_infer/``) re-expresses the reference
(``strelec/hive-serde-schema-gen``: NDJSON → strictest Hive schema → DDL,
``/root/reference/Schemer.scala``) as a distributed Spark aggregation.

Layer B (``operators/``, ``sources/``, ``functions/``, ``streaming/``) is the
scale surface: relational queries, dedup, similarity search, text analysis,
multimodal plumbing and streaming — all DataFrame/SQL-first so Catalyst and
AQE own the physical plan.
"""

__version__ = "0.1.0"
