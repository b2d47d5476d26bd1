"""A minimal transactional manifest layer over parquet — snapshot-atomic
commits, time travel, and safe compaction swaps (the mechanism the
``compact_parquet`` docstring defers to: "swap atomically at the
catalog/manifest layer").  Public design lineage: the snapshot/manifest
idea of Iceberg/Delta, reduced to the two properties this engine needs:

1. **Readers never see a partial write.** Data files land under
   ``data/<uuid>/`` first; a snapshot becomes visible only when its
   manifest (the list of file paths) is committed — readers resolve the
   current version and read exactly the listed files.
2. **Old snapshots stay readable** (time travel): a commit ADDS a
   manifest; it never deletes data another snapshot references.  A
   compaction rewrites files into a new data dir and commits a manifest
   pointing at them — concurrent readers of version N are untouched.

Commits are optimistic: ``commit(expected_version=...)`` fails if another
writer advanced the table first.  The protocol per version N: the
manifest parquet is written to ``manifests/v{N}`` with ``errorIfExists``
(a live racer fails LOUDLY at the write instead of clobbering the
winner's committed manifest), a dead prior attempt — manifest present
but marker absent — is cleaned up first (readers can't have seen it:
every read requires the marker), and the empty create-exclusive marker
``manifests/committed-v{N}`` lands LAST as the transaction boundary,
after which the writer RE-READS the committed manifest and verifies it
lists its own files — a stalled writer whose dead-looking attempt was
cleaned up and rewritten by a racer raises ``ConflictError`` instead of
mis-reporting success over the racer's data.  On filesystems with atomic
create (HDFS, local) version linearity is fully protected; two writers
racing the SAME version can both fail and retry — the committed manifest
is always one writer's coherent file list, never a blend.  On eventually-consistent object stores you'd back
the marker with a CAS service — the same caveat Delta's LogStore
documents — and in all cases concurrent COMMITS should come from one
writer per table (the streaming-ingest shape), with concurrency handled
by ``expected_version``.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestTable:
    """Handle to a manifest-managed parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- filesystem helpers (Hadoop FS: file://, hdfs://, s3a://) --------
    def _p(self, *parts):
        return self._jvm.org.apache.hadoop.fs.Path(
            "/".join([self.path, *parts])
        )

    def _fs(self):
        return self._p().getFileSystem(self._conf)

    def _exists(self, *parts) -> bool:
        return self._fs().exists(self._p(*parts))

    # -- versions --------------------------------------------------------
    def current_version(self) -> int:
        """Highest committed version, or -1 for an empty table.  ONE
        listStatus of the manifests dir (not one exists() RPC per version
        — that would be O(versions) per call and quadratic over a
        streaming writer's lifetime)."""
        mdir = self._p("manifests")
        fs = self._fs()
        if not fs.exists(mdir):
            return -1
        best = -1
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("committed-v"):
                best = max(best, int(name[len("committed-v"):]))
        return best

    def _manifest_path(self, version: int) -> str:
        return f"{self.path}/manifests/v{version}"

    # -- write path ------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        expected_version: int | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot and return its version.

        ``mode='append'``: the new snapshot = previous snapshot's files +
        the new files.  ``mode='overwrite'``: the new snapshot = the new
        files only (previous snapshots remain readable — nothing is
        deleted).  ``expected_version`` (optimistic concurrency): raise
        ``ConflictError`` if the table has moved past it."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown mode {mode!r}")  # BEFORE any write
        cur = self.current_version()
        if expected_version is not None and cur != expected_version:
            raise ConflictError(
                f"table at version {cur}, expected {expected_version}"
            )
        data_dir = f"{self.path}/data/{uuid.uuid4().hex}"
        df.write.parquet(data_dir)
        files = sorted(self.spark.read.parquet(data_dir).inputFiles())
        if mode == "append" and cur >= 0:
            files = self._files(cur) + files
        return self._commit_manifest(files, cur + 1)

    def _commit_manifest(self, files: list, new_v: int) -> int:
        """Write manifest v{new_v} (errorIfExists — a live racer fails
        loudly, never clobbers a committed manifest) then the
        create-exclusive marker.  A DEAD prior attempt (manifest present,
        marker absent) is cleaned up first: no reader can have seen it,
        every read path requires the marker."""
        fs = self._fs()
        mpath = self._p("manifests", f"v{new_v}")
        if fs.exists(mpath) and not self._exists(
            "manifests", f"committed-v{new_v}"
        ):
            fs.delete(mpath, True)
        # repartition(1), NOT coalesce(1): a coalesced local relation
        # evaluates its parallelize slices serially through one Python
        # worker (~150 ms each); _files_at sorts, so order is free.
        self.spark.createDataFrame(
            [(f,) for f in files], "file string"
        ).repartition(1).write.mode("errorifexists").parquet(
            self._manifest_path(new_v)
        )
        return self._seal(files, new_v)

    def _seal(self, files: list, new_v: int) -> int:
        """Marker create + post-marker verification, the commit's last two
        steps (separate method so the stalled-writer interleaving is
        directly testable).

        PHANTOM-COMMIT outcome (explicit contract): when the verification
        below fails, the marker this stalled writer just created is LEFT
        IN PLACE — version ``new_v`` is committed and reader-visible as
        the racer's coherent file list even though BOTH racing writers
        raise ``ConflictError``.  Removing the marker is not an option
        (a reader may already have resolved it; un-committing a visible
        snapshot breaks snapshot immutability).  Consequence for RETRIES:
        after this conflict the conflicting data may already be live in
        ``new_v``, so a blind ``commit(df, mode='append')`` retry —
        which writes a fresh uuid data dir — would append the same ROWS
        a second time.  Retry with :meth:`commit_once` (deterministic
        per-key data dir + set-deduplicated file lists: a replay commits
        an identical file set, never a duplicate), or re-read the current
        snapshot and reconcile before appending."""
        marker = self._p("manifests", f"committed-v{new_v}")
        if not self._fs().createNewFile(marker):
            raise ConflictError(f"concurrent commit of version {new_v}")
        # Post-marker verification closes the stalled-writer window: writer1
        # writes v{N} then stalls before the marker; writer2 deems the
        # attempt dead, deletes and rewrites v{N}; writer1 wakes and its
        # createNewFile still succeeds — committing writer2's file list
        # while writer1 would report success with its own data orphaned.
        # Re-reading the committed manifest and checking it lists THIS
        # writer's files turns that silent corruption into a loud
        # ConflictError (both racers fail; the committed snapshot is
        # writer2's coherent list, never a blend).
        if self._files_at(self._manifest_path(new_v)) != sorted(files):
            raise ConflictError(
                f"version {new_v} was rewritten by a concurrent writer "
                "between manifest write and marker create; the version IS "
                "committed with the other writer's file list (phantom "
                "commit) — retry with commit_once or reconcile against "
                "the current snapshot before appending"
            )
        return new_v

    def commit_once(
        self, df: DataFrame, key: str, mode: str = "append"
    ) -> int | None:
        """Idempotent keyed commit — the exactly-once primitive for
        at-least-once writers (``foreachBatch``: key = epoch id).  The
        first commit with a given ``key`` wins; a replay returns ``None``
        without writing.

        Replay safety across EVERY crash point: the data dir is
        DETERMINISTIC per key (``data/by-key/<key>``); a replay REUSES a
        completed dir (``_SUCCESS`` present) rather than rewriting it —
        rewriting would orphan the filenames an already-committed manifest
        references — and only overwrites a dir left incomplete by a crash
        mid-write.  Appended file lists are set-deduplicated, so a crash
        after the snapshot commit but before the key marker can at worst
        add a redundant version whose file set (hence content) is
        identical to the previous one."""
        import hashlib

        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown mode {mode!r}")
        raw = str(key)
        # sanitized name + hash of the RAW key: 'a b' and 'a_b' must not
        # collide into one marker (the second would silently drop data)
        safe = (
            "".join(c if c.isalnum() or c in "-_." else "_" for c in raw)
            + "-"
            + hashlib.md5(raw.encode()).hexdigest()[:8]
        )
        if self._exists("manifests", f"key-{safe}"):
            return None
        data_dir = f"{self.path}/data/by-key/{safe}"
        if not self._exists("data", "by-key", safe, "_SUCCESS"):
            df.write.mode("overwrite").parquet(data_dir)
        files = sorted(self.spark.read.parquet(data_dir).inputFiles())
        cur = self.current_version()
        if mode == "append" and cur >= 0:
            files = sorted(set(self._files(cur)) | set(files))
        new_v = self._commit_manifest(files, cur + 1)
        self._fs().createNewFile(self._p("manifests", f"key-{safe}"))
        return new_v

    def compact(self, target_mb: int = 256, sort_by=()) -> int:
        """Rewrite the CURRENT snapshot into ~target-sized files and commit
        the result as a new overwrite snapshot — the safe form of
        ``sinks.compact_parquet`` (readers of older versions race nothing:
        their files are untouched)."""
        cur = self.current_version()
        if cur < 0:
            raise ValueError("empty table")
        df = self.read(cur)
        from .layout import file_sizes

        total = sum(file_sizes(self.spark, df))
        n_out = max(1, -(-total // (target_mb * 1024 * 1024)))
        if sort_by:
            df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            df = df.repartition(n_out)
        return self.commit(df, mode="overwrite", expected_version=cur)

    # -- read path -------------------------------------------------------
    def _files_at(self, manifest_path: str) -> list:
        return sorted(
            r["file"]
            for r in self.spark.read.parquet(manifest_path).collect()
        )

    def _files(self, version: int) -> list:
        return self._files_at(self._manifest_path(version))

    def read(self, version: int | None = None) -> DataFrame:
        """The snapshot at ``version`` (default: current) — reads exactly
        the manifest's files; uncommitted data dirs are invisible."""
        if version is None:
            version = self.current_version()
        if version < 0:
            raise ValueError("empty table")
        if not self._exists("manifests", f"committed-v{version}"):
            raise ValueError(f"version {version} was never committed")
        return self.spark.read.parquet(*self._files(version))


class ConflictError(RuntimeError):
    """Another writer committed first — re-read and retry."""


# ---------------------------------------------------------------------------
# Round-10: single-writer lease for append-only index directories
# ---------------------------------------------------------------------------

_LOCK_NAME = ".writer-lock"


def _hadoop(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path


class index_writer_lock:
    """Single-writer mutex over an append-only index directory — ENFORCES
    the rule the round-9 compaction docstrings only documented: an extend
    racing a compaction would have its appended files silently dropped by
    the swap (the rewrite's input listing predates the append), so
    mutating writers must exclude each other.

    Built on the same primitive the manifest commit protocol rests on:
    Hadoop ``FileSystem.create(overwrite=false)`` is atomic on HDFS/local
    (object stores need a CAS service, exactly the manifest-layer caveat).
    The lock file records its holder, so the loser's ``ConflictError``
    names who is in flight.

    ``owner``: a stable pipeline identity (e.g. a streaming query's
    checkpoint id).  A held lock whose recorded owner EQUALS ``owner``
    is re-acquired instead of refused — a restart of the same pipeline
    after a crash mid-batch must not deadlock on its own stale lease.
    Two writers sharing an owner string forfeit mutual exclusion; owners
    therefore name ONE logical writer, never a writer class.

    A crashed anonymous writer leaves a stale lock: verify the writer is
    dead, then :func:`break_index_lock`.  READERS never touch the lock —
    probes stay lock-free (the append-only artifacts make any point-in-
    time file listing a coherent index; only rewrites need exclusion,
    and those writers hold this lease)."""

    def __init__(self, spark: SparkSession, path: str, owner: str | None = None):
        self.spark = spark
        self.path = path
        self.owner = owner

    def _read_owner(self, fs, lock) -> str:
        try:
            stream = fs.open(lock)
            try:
                data = bytes(
                    stream.readAllBytes()
                    if hasattr(stream, "readAllBytes")
                    else b""
                )
            finally:
                stream.close()
            return data.decode("utf-8", "replace")
        except Exception:
            return ""

    def __enter__(self):
        fs, hpath = _hadoop(self.spark, self.path)
        lock = hpath(f"{self.path}/{_LOCK_NAME}")
        token = (self.owner or "").encode("utf-8")
        try:
            out = fs.create(lock, False)  # atomic create-exclusive
            try:
                out.write(token)
            finally:
                out.close()
            return self
        except Exception:
            holder = self._read_owner(fs, lock)
            if self.owner is not None and holder == self.owner:
                return self  # same pipeline re-entering after a restart
            raise ConflictError(
                f"index at {self.path} has a writer in flight"
                + (f" (owner {holder!r})" if holder else "")
                + " — extends and compactions are single-writer; retry "
                "after it finishes, or break_index_lock() if it is dead"
            ) from None

    def __exit__(self, *exc):
        fs, hpath = _hadoop(self.spark, self.path)
        fs.delete(hpath(f"{self.path}/{_LOCK_NAME}"), False)
        return False


def break_index_lock(spark: SparkSession, path: str) -> bool:
    """Remove a stale writer lease (after verifying the writer is dead —
    this is the manual recovery step, never an automatic timeout).
    Returns True if a lock existed."""
    fs, hpath = _hadoop(spark, path)
    return bool(fs.delete(hpath(f"{path}/{_LOCK_NAME}"), False))
