"""Index compaction: an appended-to index rewritten back into its
initial-build clustering must (a) probe BIT-IDENTICALLY to its
pre-compaction self, (b) preserve the meta/version contract so extends
keep working, and (c) restore the row-group pruning evidence the append
tail lost — checked against raw parquet footers via pyarrow, the same
statistics Spark's reader uses for row-group skipping."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)
from pyspark.sql import functions as F

from hive_serde_schema_gen_spark.operators.dedup_index import (
    build_minhash_index,
    compact_minhash_index,
    dedup_against_index,
    extend_minhash_index,
)
from hive_serde_schema_gen_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
    compact_text_index,
    extend_text_index,
)
from hive_serde_schema_gen_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _file_ranges(path, *cols):
    """Per-file composite (min, max) of the cluster column(s), from
    footers — tuples compare lexicographically, matching
    ``repartitionByRange(*cols)`` semantics."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idxs = [names.index(c) for c in cols]
        lo = tuple(
            min(
                md.row_group(g).column(i).statistics.min
                for g in range(md.num_row_groups)
            )
            for i in idxs
        )
        hi = tuple(
            max(
                md.row_group(g).column(i).statistics.max
                for g in range(md.num_row_groups)
            )
            for i in idxs
        )
        out.append((lo, hi))
    return out


def _overlap_count(ranges):
    """Pairs of files whose cluster-column ranges intersect."""
    n = 0
    for i, (lo_a, hi_a) in enumerate(ranges):
        for lo_b, hi_b in ranges[i + 1 :]:
            if lo_a <= hi_b and lo_b <= hi_a:
                n += 1
    return n


@pytest.fixture(scope="module")
def bm25_index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25-compact"))
    # build over one half, append the other in two batches: the appended
    # files each span the whole term range (clustering lost)
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), path, n_files=8)
    extend_text_index(
        docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 1)),
        path,
        n_files=2,
    )
    extend_text_index(
        docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 3)),
        path,
        n_files=2,
    )
    return path


def test_bm25_probe_identical_after_compaction(spark, bm25_index):
    before = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(
            spark, bm25_index, "data filter group", k=25
        ).collect()
    ]
    compact_text_index(spark, bm25_index, n_files=8)
    after = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(
            spark, bm25_index, "data filter group", k=25
        ).collect()
    ]
    assert before == after  # bit-identical scores AND order
    assert len(before) == 25


def test_bm25_compaction_restores_term_clustering(spark, bm25_index):
    # runs after the compaction above (same module-scoped index)
    ranges = _file_ranges(f"{bm25_index}/postings", "term")
    assert len(ranges) > 1
    # range-clustered files: each term lives in ~1 file; appended-tail
    # files spanning the whole alphabet would overlap every other file
    assert _overlap_count(ranges) <= len(ranges) // 2
    # df merged to one row per term, stats to one additive row
    df = spark.read.parquet(f"{bm25_index}/df")
    assert df.groupBy("term").count().filter("count > 1").count() == 0
    assert spark.read.parquet(f"{bm25_index}/stats").count() == 1


def test_bm25_compaction_preserves_meta_and_extends(spark, docs, bm25_index):
    m = spark.read.parquet(f"{bm25_index}/meta").collect()[0]
    assert m["version"] == 2 and m["tokenizer"] == "lower-ws"
    # an extend AFTER compaction still works and still scores like a
    # from-scratch build over the union corpus
    import tempfile

    extra = docs.limit(0)  # empty batch: exercises the path, changes nothing
    extend_text_index(extra, bm25_index, n_files=1)
    ref = str(tempfile.mkdtemp(prefix="bm25-ref-"))
    build_text_index(docs, ref, n_files=8)
    got = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(
            spark, bm25_index, "data filter group", k=25
        ).collect()
    ]
    want = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk_indexed(
            spark, ref, "data filter group", k=25
        ).collect()
    ]
    assert got == want


@pytest.fixture(scope="module")
def mh_index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh-compact"))
    build_minhash_index(docs.filter(F.col("doc_id") % 2 == 0), path, n_files=8)
    extend_minhash_index(
        docs.filter(F.col("doc_id") % 2 == 1).limit(100), path, epoch=7
    )
    return path


def test_minhash_probe_identical_after_compaction(spark, docs, mh_index):
    probe = docs.limit(40)
    before = sorted(
        map(tuple, dedup_against_index(probe, mh_index).collect())
    )
    compact_minhash_index(spark, mh_index, n_files=8)
    after = sorted(
        map(tuple, dedup_against_index(probe, mh_index).collect())
    )
    assert before == after
    assert len(before) > 0  # the probe overlaps the indexed corpus


def test_minhash_compaction_preserves_epoch_attribution(spark, mh_index):
    # runs post-compaction: the epoch stamps survive row-for-row (the
    # streaming re-delivery guard depends on them)
    sigs = spark.read.parquet(f"{mh_index}/sigs")
    assert sigs.filter(F.col("epoch") == 7).count() == 100
    # band clustering restored: a range partition on (band, band_key) can
    # straddle at most one band boundary, so every compacted file spans
    # <= 2 bands — the appended tail spanned all 4
    ranges = _file_ranges(f"{mh_index}/bands", "band")
    assert len(ranges) > 1
    assert all(hi[0] - lo[0] <= 1 for lo, hi in ranges), ranges


def test_minhash_compaction_reclaims_replay_duplicates(spark, docs, tmp_path):
    """streaming/ingest defers replay-duplicate reclamation to 'the next
    compaction' — compaction must actually drop the row-identical copies
    a replayed extend appends, while probing identically."""
    path = str(tmp_path / "mh-replay")
    base = docs.limit(60)
    batch = docs.filter(F.col("doc_id") >= 200).limit(40)
    build_minhash_index(base, path, n_files=4)
    extend_minhash_index(batch, path, epoch=3)
    extend_minhash_index(batch, path, epoch=3)  # the replay
    sigs_before = spark.read.parquet(f"{path}/sigs").count()
    probe = docs.limit(30)
    before = sorted(map(tuple, dedup_against_index(probe, path).collect()))
    compact_minhash_index(spark, path, n_files=4)
    sigs_after = spark.read.parquet(f"{path}/sigs").count()
    assert sigs_before == 60 + 2 * 40
    assert sigs_after == 60 + 40  # replay copies reclaimed
    after = sorted(map(tuple, dedup_against_index(probe, path).collect()))
    assert before == after
