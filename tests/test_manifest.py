"""Manifest table: snapshot atomicity, append/overwrite semantics, time
travel, compaction swap, conflict detection, and invisibility of
uncommitted data."""

from __future__ import annotations

import glob
import os

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)

from hive_serde_schema_gen_spark.sources.manifest import ConflictError, ManifestTable


@pytest.fixture()
def table(spark, tmp_path):
    return ManifestTable(spark, str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_and_time_travel(spark, table):
    assert table.current_version() == -1
    v0 = table.commit(_df(spark, 0, 10))
    v1 = table.commit(_df(spark, 10, 30))
    assert (v0, v1) == (0, 1)
    assert table.read(0).count() == 10  # old snapshot intact
    assert table.read(1).count() == 30
    assert table.read().count() == 30  # default = current


def test_overwrite_keeps_history(spark, table):
    table.commit(_df(spark, 0, 10))
    v1 = table.commit(_df(spark, 100, 105), mode="overwrite")
    assert sorted(r["id"] for r in table.read(v1).collect()) == list(range(100, 105))
    assert table.read(0).count() == 10  # time travel across overwrite


def test_uncommitted_data_invisible(spark, table):
    table.commit(_df(spark, 0, 10))
    # simulate a writer crash: data files land but no manifest/marker
    _df(spark, 900, 950).write.parquet(f"{table.path}/data/orphan")
    assert table.read().count() == 10
    assert table.current_version() == 0


def test_compaction_swap(spark, table):
    table.commit(_df(spark, 0, 5000).repartition(32))
    n_files_before = len(table._files(0))
    assert n_files_before > 1
    v = table.compact(target_mb=1024, sort_by=["id"])
    assert v == 1
    assert len(table._files(1)) < n_files_before
    got = sorted(r["id"] for r in table.read(1).collect())
    assert got == list(range(5000))  # data identical through the swap
    assert table.read(0).count() == 5000  # pre-compaction snapshot readable


def test_conflict_detection(spark, table):
    table.commit(_df(spark, 0, 10))
    with pytest.raises(ConflictError):
        table.commit(_df(spark, 10, 20), expected_version=-1)
    # correct expectation passes
    table.commit(_df(spark, 10, 20), expected_version=0)
    assert table.current_version() == 1


def test_read_uncommitted_version_raises(spark, table):
    table.commit(_df(spark, 0, 3))
    with pytest.raises(ValueError, match="never committed"):
        table.read(7)


def test_commit_once_replay_is_noop(spark, table):
    d = _df(spark, 0, 20)
    v = table.commit_once(d, key=7)
    assert v == 0
    assert table.commit_once(d, key=7) is None  # replay
    assert table.current_version() == 0
    assert table.read().count() == 20
    # a different key commits normally
    assert table.commit_once(_df(spark, 20, 25), key=8) == 1
    assert table.read().count() == 25


def test_commit_once_crash_before_key_marker(spark, table):
    """Crash window: snapshot committed, key marker missing → the replay
    may add a redundant version, but the readable content is identical."""
    import hashlib

    table.commit_once(_df(spark, 0, 10), key="e1")
    # simulate the crash: remove only the key marker (sanitized name
    # carries the raw-key hash suffix)
    safe = "e1-" + hashlib.md5(b"e1").hexdigest()[:8]
    fs = table._fs()
    fs.delete(table._p("manifests", f"key-{safe}"), False)
    v = table.commit_once(_df(spark, 0, 10), key="e1")
    assert v == 1  # redundant version...
    a = sorted(r["id"] for r in table.read(0).collect())
    b = sorted(r["id"] for r in table.read(1).collect())
    assert a == b == list(range(10))  # ...with identical content


def test_commit_once_distinct_keys_never_collide(spark, table):
    # 'a b' and 'a_b' sanitize identically but are DIFFERENT keys — the
    # raw-key hash suffix keeps them apart (the second must not be
    # silently dropped as a replay)
    assert table.commit_once(_df(spark, 0, 5), key="a b") == 0
    assert table.commit_once(_df(spark, 5, 9), key="a_b") == 1
    assert table.read().count() == 9


def test_commit_mode_validated_before_write(spark, table, tmp_path):
    with pytest.raises(ValueError, match="unknown mode"):
        table.commit(_df(spark, 0, 5), mode="apend")
    # nothing was written: table still empty, no orphan data dirs
    assert table.current_version() == -1
    import glob
    assert not glob.glob(f"{table.path}/data/*")


def test_loser_cannot_clobber_committed_manifest(spark, table):
    """Race shape: writer A computes new_v from a stale read, writer B
    commits that version first.  A's manifest write must FAIL (loudly),
    leaving B's committed manifest intact."""
    table.commit(_df(spark, 0, 10))  # B commits v0
    files_b = table._files(0)
    with pytest.raises(Exception):
        # A attempts v0 directly (the stale-new_v path)
        table._commit_manifest(["phantom.parquet"], 0)
    assert table._files(0) == files_b  # B's manifest untouched
    assert table.read(0).count() == 10


def test_stalled_writer_detects_cleanup_rewrite(spark, table):
    """The stalled-writer interleaving: writer1 writes manifests/v0 then
    stalls BEFORE the marker; writer2 deems the attempt dead, deletes and
    rewrites v0 with its own files; writer1 wakes and its marker create
    succeeds.  Pre-fix writer1 reported success while the committed
    manifest listed writer2's files (writer1's data silently orphaned);
    the post-marker verification must make BOTH writers fail loudly and
    leave writer2's coherent list as the committed content."""
    fs = table._fs()
    # writer1: data + manifest write, then stall (no marker)
    d1 = f"{table.path}/data/w1"
    _df(spark, 0, 5).write.parquet(d1)
    files1 = sorted(spark.read.parquet(d1).inputFiles())
    spark.createDataFrame([(f,) for f in files1], "file string").coalesce(
        1
    ).write.parquet(table._manifest_path(0))
    # writer2: cleanup (manifest present, marker absent => dead), rewrite
    d2 = f"{table.path}/data/w2"
    _df(spark, 100, 110).write.parquet(d2)
    files2 = sorted(spark.read.parquet(d2).inputFiles())
    fs.delete(table._p("manifests", "v0"), True)
    spark.createDataFrame([(f,) for f in files2], "file string").coalesce(
        1
    ).write.parquet(table._manifest_path(0))
    # writer1 wakes: marker create succeeds, verification must catch the swap
    with pytest.raises(ConflictError):
        table._seal(files1, 0)
    # writer2 resumes: marker already exists => loud failure too
    with pytest.raises(ConflictError):
        table._seal(files2, 0)
    # the committed content is writer2's coherent list, never a blend
    assert table._files(0) == files2
    assert table.read(0).count() == 10


def test_phantom_commit_visible_and_commit_once_retry_safe(spark, table):
    """Round-9 review contract: after the stalled-writer race, the
    contested version IS committed (reader-visible, the racer's coherent
    list) even though both writers raised — and the documented retry
    path (commit_once, deterministic per-key data dir + set-deduped
    lists) cannot double-append the rows that are already live."""
    fs = table._fs()
    # build the phantom: writer1 stalls pre-marker, writer2 rewrites v0
    d1 = f"{table.path}/data/w1"
    _df(spark, 0, 5).write.parquet(d1)
    files1 = sorted(spark.read.parquet(d1).inputFiles())
    spark.createDataFrame([(f,) for f in files1], "file string").coalesce(
        1
    ).write.parquet(table._manifest_path(0))
    fs.delete(table._p("manifests", "v0"), True)
    # writer2 is a commit_once writer that crashes before its key marker
    key = "epoch-7"
    import hashlib

    safe = key + "-" + hashlib.md5(key.encode()).hexdigest()[:8]
    d2 = f"{table.path}/data/by-key/{safe}"
    _df(spark, 100, 110).write.parquet(d2)
    files2 = sorted(spark.read.parquet(d2).inputFiles())
    spark.createDataFrame([(f,) for f in files2], "file string").coalesce(
        1
    ).write.parquet(table._manifest_path(0))
    with pytest.raises(ConflictError):
        table._seal(files1, 0)  # writer1 wakes: phantom-commits writer2's list
    # the phantom IS the committed, reader-visible state
    assert table.current_version() == 0
    assert table._files(0) == files2
    assert table.read(0).count() == 10
    # writer2's retry via commit_once: same key -> same data dir -> the
    # appended list set-dedupes to the identical file set, rows NOT doubled
    v = table.commit_once(_df(spark, 100, 110), key=key)
    assert v == 1
    assert table._files(1) == files2
    assert table.read(1).count() == 10  # not 20
