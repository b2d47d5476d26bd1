"""Round-10: the single-writer lease over append-only index dirs —
the rule compact_*'s docstrings used to merely document ("do not run
compaction while an extend is in flight") is now enforced: a concurrent
extend fails with ConflictError instead of having its appended files
silently dropped by the compaction swap."""

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
    compact_text_index,
    extend_text_index,
)
from hive_serde_schema_gen_spark.sources.manifest import (
    ConflictError,
    break_index_lock,
    index_writer_lock,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, f"alpha beta gamma{i} delta common") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_extend_during_compaction_conflicts_and_nothing_is_lost(
    spark, docs, tmp_path
):
    """The round-9 verdict's exact hazard, interleaved: compaction holds
    the lease (as compact_text_index does for its whole rewrite); an
    extend arriving mid-compaction must FAIL — not append files the swap
    then drops — and a retry after the compaction lands the batch, probe-
    visible."""
    path = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") < 30), path, n_files=2)
    batch = docs.filter(F.col("doc_id") >= 30)
    with index_writer_lock(spark, path):  # compaction in flight
        with pytest.raises(ConflictError):
            extend_text_index(batch, path)
        # the refused extend wrote NOTHING: the index still probes as the
        # 30-doc build (a dropped-batch world would also pass here — the
        # loss shows when the caller believes the extend succeeded; the
        # ConflictError is exactly what prevents that belief)
        assert (
            bm25_topk_indexed(spark, path, "common", k=50).count() == 30
        )
    # writer done -> lease free -> the retry lands and is probe-visible
    extend_text_index(batch, path)
    assert bm25_topk_indexed(spark, path, "common", k=50).count() == 40


def test_compaction_refused_while_extend_holds_the_lease(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    build_text_index(docs, path, n_files=2)
    with index_writer_lock(spark, path, owner="ingest:corpusA"):
        with pytest.raises(ConflictError, match="ingest:corpusA"):
            compact_text_index(spark, path)
    compact_text_index(spark, path)  # after release: fine
    assert bm25_topk_indexed(spark, path, "common", k=50).count() == 40


def test_same_owner_reacquires_after_crash(spark, docs, tmp_path):
    """A streaming pipeline that crashed mid-batch must not deadlock on
    its own stale lease — same owner re-enters; a foreign writer still
    conflicts."""
    path = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") < 30), path, n_files=2)
    lock = index_writer_lock(spark, path, owner="ingest:corpusA")
    lock.__enter__()  # crash here: lease left behind
    # restart of the SAME pipeline: re-acquires, extend succeeds
    extend_text_index(
        docs.filter(F.col("doc_id") >= 30), path, owner="ingest:corpusA"
    )
    # lease was released by the extend's exit; a foreign writer now runs
    compact_text_index(spark, path)
    assert bm25_topk_indexed(spark, path, "common", k=50).count() == 40


def test_break_index_lock_recovers_a_dead_writer(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    build_text_index(docs, path, n_files=2)
    index_writer_lock(spark, path).__enter__()  # anonymous writer dies
    with pytest.raises(ConflictError):
        extend_text_index(docs.limit(0), path)
    assert break_index_lock(spark, path) is True
    assert break_index_lock(spark, path) is False  # idempotent
    compact_text_index(spark, path)


def test_minhash_and_ivf_mutators_hold_the_lease(spark, docs, tmp_path):
    """Every index family's mutators route through the same lease."""
    from hive_serde_schema_gen_spark.operators.dedup_index import (
        build_minhash_index,
        compact_minhash_index,
        extend_minhash_index,
    )

    mh = str(tmp_path / "mh")
    build_minhash_index(docs.filter(F.col("doc_id") < 30), mh, n_files=2)
    with index_writer_lock(spark, mh):
        with pytest.raises(ConflictError):
            extend_minhash_index(docs.filter(F.col("doc_id") >= 30), mh)
        with pytest.raises(ConflictError):
            compact_minhash_index(spark, mh)
    extend_minhash_index(docs.filter(F.col("doc_id") >= 30), mh)

    from hive_serde_schema_gen_spark.operators.similarity import (
        extend_ivf_index,
        persist_ivf_index,
    )

    e = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) / 13 for j in range(64)], "x")
         for i in range(40)],
        "vec_id long, embedding array<float>, label string",
    )
    ivf = str(tmp_path / "ivf")
    persist_ivf_index(e.filter(F.col("vec_id") < 30), ivf)
    with index_writer_lock(spark, ivf):
        with pytest.raises(ConflictError):
            extend_ivf_index(e.filter(F.col("vec_id") >= 30), ivf)
    extend_ivf_index(e.filter(F.col("vec_id") >= 30), ivf)
