"""Incremental image near-dup dedup against a PERSISTED pHash index —
the image twin of ``dedup_index.py``: a new image batch dedups against
the historical corpus by probing an on-disk artifact, never re-decoding
the petabytes already processed.  (Batch twin:
``multimodal.phash_near_dup_pairs`` / ``phash_dedup``; streaming twin:
``streaming/image_ingest.py``.)

Index layout (parquet, under one directory):

- ``bands/``  — ``(band, band_val, img_id)``: the 64-bit dHash split
  into ``PHASH_BANDS`` byte bands, range-clustered + sorted on
  ``(band, band_val)`` so a probe batch's band values prune row groups
  via min/max footers (the ``dedup_index`` mechanics);
- ``hashes/`` — ``(img_id, dhash, ahash, epoch)``: one 17-byte row per
  indexed image — the FULL hash, so verification is EXACT popcount;
- ``meta/``   — one row pinning (version, n_bands, grid); probes assert
  the constants match, so an index built under different banding fails
  loudly instead of silently missing candidates.

Two contracts are STRONGER than the MinHash index's:

1. verification is exact, not estimated — the whole 8-byte hash is
   stored (the MinHash index stores a 16-hash signature because exact
   Jaccard would need the shingle sets ≈ the corpus; a perceptual hash
   IS the whole fingerprint), so there is no ±1/16 borderline band;
2. recall at radius <= PHASH_BANDS − 1 is exact by pigeonhole — a probe
   is a deterministic operator, not an approximation.

Writer discipline is inherited: mutating writers hold the single-writer
lease (``manifest.index_writer_lock``); appends are new parquet files
(O(batch) per extend); :func:`compact_phash_index` reclaims replayed
duplicates and restores the range clustering without re-decoding any
image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import PHASH_BANDS, PHASH_GRID, PHASH_RADIUS

PHASH_INDEX_VERSION = 1
_BAND_W = 64 // PHASH_BANDS
_BAND_MASK = (1 << _BAND_W) - 1


def _band_rows(
    hashes: DataFrame, id_col: str = "img_id", hash_col: str = "dhash"
) -> DataFrame:
    """(band, band_val, <id>) — the on-disk banding, identical to the
    batch operator's in-memory banding so batch and index probes can
    never disagree on candidates.  Column names are parameters so the
    AUDIO index (``afp_index.py`` — hash_col='afp') reuses the exact
    same mechanics; the stored column names stay the image ones (the
    artifact layout is shared)."""
    pairs = []
    for k in range(PHASH_BANDS):
        pairs.extend(
            [
                F.lit(k),
                F.shiftrightunsigned(
                    F.col(hash_col), _BAND_W * k
                ).bitwiseAND(F.lit(_BAND_MASK)),
            ]
        )
    return hashes.select(
        F.col(id_col).alias("img_id"),
        F.stack(F.lit(PHASH_BANDS), *pairs).alias("band", "band_val"),
    ).select("band", "band_val", "img_id")


def _select_stored(
    hashes: DataFrame, id_col: str, hash_col: str, aux_cols: tuple
) -> DataFrame:
    """Normalize an input frame to the STORED column names (img_id,
    dhash[, ahash…]) — the artifact layout is shared across families, so
    an audio frame (aud_id, afp) lands on disk as (img_id, dhash)."""
    cols = [F.col(id_col).alias("img_id"), F.col(hash_col).alias("dhash")]
    cols += [F.col(c) for c in aux_cols]
    return hashes.select(*cols)


def build_phash_index(
    hashes: DataFrame,
    path: str,
    n_files: int = 32,
    owner: str | None = None,
    *,
    id_col: str = "img_id",
    hash_col: str = "dhash",
    aux_cols: tuple = ("ahash",),
    grid: int = PHASH_GRID,
) -> None:
    """Build the persisted index from an ``image_hashes`` frame
    ``(img_id, …, dhash, ahash)``.  One pass: band rows range-clustered
    on (band, band_val); hash rows clustered on img_id for the
    verification join.  The keyword block parameterizes the family —
    ``afp_index.py`` passes the audio column names and ``grid`` =
    AFP_WINDOWS, which the meta check then enforces (an audio index
    probed as an image index fails loudly on the grid pin)."""
    from ..sources.manifest import index_writer_lock

    spark = hashes.sparkSession
    with index_writer_lock(spark, path, owner):
        h = _select_stored(hashes, id_col, hash_col, aux_cols).localCheckpoint()
        (
            _band_rows(h)
            .repartitionByRange(n_files, "band", "band_val")
            .sortWithinPartitions("band", "band_val")
            .write.mode("overwrite")
            .parquet(f"{path}/bands")
        )
        (
            h.withColumn("epoch", F.lit(None).cast("long"))
            .repartitionByRange(max(1, n_files // 4), "img_id")
            .sortWithinPartitions("img_id")
            .write.mode("overwrite")
            .parquet(f"{path}/hashes")
        )
        spark.createDataFrame(
            [(PHASH_INDEX_VERSION, PHASH_BANDS, grid)],
            "version int, n_bands int, grid int",
        ).write.mode("overwrite").parquet(f"{path}/meta")


def extend_phash_index(
    hashes: DataFrame,
    path: str,
    epoch: int | None = None,
    owner: str | None = None,
    *,
    id_col: str = "img_id",
    hash_col: str = "dhash",
    aux_cols: tuple = ("ahash",),
    grid: int = PHASH_GRID,
) -> None:
    """Append a batch's band + hash rows (run AFTER dedup: index the
    SURVIVORS).  ``epoch`` stamps the hash rows with the writing
    micro-batch — the cross-epoch re-delivery attribution
    ``streaming/image_ingest.py`` depends on (same contract as
    ``extend_minhash_index``).  Appends are new files; clustering is
    restored by the next :func:`compact_phash_index`."""
    from ..sources.manifest import index_writer_lock

    with index_writer_lock(hashes.sparkSession, path, owner):
        _check_meta(hashes.sparkSession, path, grid)
        h = _select_stored(hashes, id_col, hash_col, aux_cols).localCheckpoint()
        _band_rows(h).write.mode("append").parquet(f"{path}/bands")
        h.withColumn("epoch", F.lit(epoch).cast("long")).write.mode(
            "append"
        ).parquet(f"{path}/hashes")


def _check_meta(
    spark: SparkSession, path: str, grid: int = PHASH_GRID
) -> None:
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    got = (m["version"], m["n_bands"], m["grid"])
    want = (PHASH_INDEX_VERSION, PHASH_BANDS, grid)
    if got != want:
        raise ValueError(
            f"phash index at {path} was built with parameters {got}, "
            f"this build expects {want} — rebuild the index"
        )


def phash_against_index(
    new_hashes: DataFrame,
    path: str,
    radius: int = PHASH_RADIUS,
    broadcast_batch: bool = True,
    *,
    id_col: str = "img_id",
    hash_col: str = "dhash",
    grid: int = PHASH_GRID,
) -> DataFrame:
    """Probe the index with a batch's hash frame: ``(img_id,
    matched_img_id, dist)`` — one row per (new image, indexed image)
    pair within Hamming distance ``radius``; EXACT verification, exact
    recall for ``radius <= PHASH_BANDS - 1``.

    Scale shape: the batch's band rows broadcast (8 rows × ~24 bytes per
    image); the candidate join runs map-side over the on-disk bands scan
    with range-clustering pruning row groups — index data never
    shuffles.  The verify join reads only candidate hash rows."""
    spark = new_hashes.sparkSession
    _check_meta(spark, path, grid)
    if radius > PHASH_BANDS - 1:
        raise ValueError(
            f"radius {radius} exceeds the exact-recall bound "
            f"{PHASH_BANDS - 1}; band the hash finer or lower the radius"
        )
    h_new = _select_stored(new_hashes, id_col, hash_col, ()).localCheckpoint()
    bands_new = _band_rows(h_new)
    if broadcast_batch:
        bands_new = F.broadcast(bands_new)
    bands_idx = spark.read.parquet(f"{path}/bands")
    cand = (
        bands_idx.alias("i")
        .join(
            bands_new.alias("n"),
            (F.col("i.band") == F.col("n.band"))
            & (F.col("i.band_val") == F.col("n.band_val")),
        )
        .select(
            F.col("n.img_id").alias("img_id"),
            F.col("i.img_id").alias("matched_img_id"),
        )
        .distinct()
    )
    # Dedupe the verify side on (img_id, dhash), IGNORING epoch: the
    # same img_id extended under two different epochs leaves two rows
    # that differ only in epoch (compact's distinct keeps both — the
    # epoch stamp is load-bearing for replay idempotence), and joining
    # both would emit each match twice.  Projection before distinct
    # keeps this a 2-column scan.
    hashes_idx = (
        spark.read.parquet(f"{path}/hashes")
        .select("img_id", "dhash")
        .distinct()
    )
    dist = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        cand.join(h_new.alias("a"), cand["img_id"] == F.col("a.img_id"))
        .join(
            hashes_idx.alias("b"),
            cand["matched_img_id"] == F.col("b.img_id"),
        )
        .select(
            cand["img_id"],
            cand["matched_img_id"],
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= radius)
    )


def novel_images(
    new_hashes: DataFrame,
    matches: DataFrame,
    id_col: str = "img_id",
    match_id_col: str = "img_id",
) -> DataFrame:
    """The batch rows with no index match — the survivors to keep and
    index (left-anti on the id)."""
    return new_hashes.join(
        matches.select(F.col(match_id_col).alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


def compact_phash_index(
    spark: SparkSession,
    path: str,
    n_files: int = 32,
    owner: str | None = None,
    *,
    grid: int = PHASH_GRID,
) -> None:
    """Rewrite an appended-to index back into its initial clustering —
    exact-duplicate rows (a replayed extend's copies are row-identical,
    epoch included) dropped, range clustering restored; O(index rows),
    no image ever re-decoded.  Same swap discipline as
    ``compact_minhash_index``: rewrite to temp dirs under the lease,
    then swap."""
    from ..sources.manifest import index_writer_lock
    from .text_index import _swap_rewrite

    with index_writer_lock(spark, path, owner):
        _check_meta(spark, path, grid)
        bands = spark.read.parquet(f"{path}/bands").distinct()
        hashes = spark.read.parquet(f"{path}/hashes").distinct()
        _swap_rewrite(
            spark, path, "bands",
            lambda tmp: bands.repartitionByRange(n_files, "band", "band_val")
            .sortWithinPartitions("band", "band_val")
            .write.parquet(tmp),
        )
        _swap_rewrite(
            spark, path, "hashes",
            lambda tmp: hashes.repartitionByRange(
                max(1, n_files // 4), "img_id"
            )
            .sortWithinPartitions("img_id")
            .write.parquet(tmp),
        )
