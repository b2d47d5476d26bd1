"""Slot scratch-dir hygiene (round 13): every driver-oracle slot that
builds a persisted index / file fixture at query time must remove its
scratch dir before returning (``operators/scratch.with_slot_scratch``) —
a long-lived driver session running repeated 50-slot sweeps must not
accumulate ``*-slot-`` tempdirs (round-12 verdict hardening finding #3).

The sweep below runs each formerly-leaking evidence path TWICE (the
driver-shaped double sweep) at sf0.001 and asserts the OS tempdir gained
no ``-slot-`` entries, and that the returned frames stay usable after
cleanup (eager checkpoint happened before the rmtree)."""

from __future__ import annotations

import glob
import tempfile

import pytest

pytestmark = pytest.mark.slow  # regression-depth tail (see pyproject.toml)


def _slot_dirs():
    return set(glob.glob(tempfile.gettempdir() + "/*-slot-*"))


@pytest.fixture()
def assert_no_new_slot_dirs():
    before = _slot_dirs()
    yield
    leaked = _slot_dirs() - before
    assert not leaked, f"leaked slot scratch dirs: {sorted(leaked)}"


def test_with_slot_scratch_contract(spark, assert_no_new_slot_dirs):
    """The helper itself: frame usable after the dir is gone, cleanup
    also runs when the build raises."""
    import os

    from hive_serde_schema_gen_spark.operators.scratch import (
        with_slot_scratch,
    )

    seen = {}

    def _build(path):
        seen["path"] = path
        df = spark.range(5)
        df.write.parquet(f"{path}/t")
        return spark.read.parquet(f"{path}/t")

    out = with_slot_scratch("unit-slot-", _build)
    assert not os.path.exists(seen["path"])
    assert out.count() == 5  # checkpointed before removal

    with pytest.raises(RuntimeError, match="boom"):
        with_slot_scratch(
            "unit-slot-", lambda p: (_ for _ in ()).throw(RuntimeError("boom"))
        )


def test_index_slots_leave_no_scratch(spark, sf_dir, assert_no_new_slot_dirs):
    """Double sweep over every formerly-leaking slot evidence path."""
    from hive_serde_schema_gen_spark.operators.clustering import (
        semdedup_probe_evidence,
    )
    from hive_serde_schema_gen_spark.operators.dedup import dedup_index_probe
    from hive_serde_schema_gen_spark.operators.hybrid import (
        hybrid_freetext_topk,
        hybrid_retrieval_topk,
    )
    from hive_serde_schema_gen_spark.operators.text_index import (
        bm25_indexed_probe,
    )
    from hive_serde_schema_gen_spark.operators.corpus import (
        web_corpus_crawl_query,
    )

    for _sweep in range(2):
        matches, novel, triage = dedup_index_probe(spark, sf_dir)
        assert matches.count() > 0 and novel.count() > 0
        assert semdedup_probe_evidence(spark, sf_dir).count() > 0
        assert bm25_indexed_probe(spark, sf_dir).count() > 0
        assert hybrid_retrieval_topk(spark, sf_dir).count() > 0
        assert hybrid_freetext_topk(spark, sf_dir).count() > 0
        assert web_corpus_crawl_query(spark, sf_dir).count() > 0
