"""Training-order manifest (`packing.training_manifest`): within-shard
offsets are the prefix sums of token counts in epoch-hash order, shard
assignment matches `epoch_shuffle`'s, chunk bounds follow the
`chunk_token_stream` conventions (empty doc -> chunk_last = chunk_first-1),
and the layout is reproducible across invocations."""

from __future__ import annotations

from hive_serde_schema_gen_spark.operators.packing import (
    epoch_shuffle,
    training_manifest,
)

ROWS = [(i, f"d{i % 3}", (i * 7) % 11) for i in range(40)] + [(99, "d0", 0)]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, source string, n_tokens long"
    )


def test_offsets_are_prefix_sums_in_order(spark):
    m = training_manifest(_df(spark), epoch=2, context_len=8, n_shards=3)
    rows = m.collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2}
    for shard, items in by_shard.items():
        items.sort(key=lambda r: (r["order_hash"], r["doc_id"]))
        run = 0
        for r in items:
            assert r["offset"] == run
            run += r["n_tokens"]
            # chunk bound conventions
            if r["n_tokens"] == 0:
                assert r["chunk_last"] == r["chunk_first"] - 1
            else:
                assert r["chunk_first"] == r["offset"] // 8
                assert (
                    r["chunk_last"]
                    == (r["offset"] + r["n_tokens"] - 1) // 8
                )


def test_shards_match_epoch_shuffle(spark):
    d = _df(spark)
    m = {
        r["doc_id"]: r["shard"]
        for r in training_manifest(
            d, epoch=4, context_len=8, n_shards=5
        ).collect()
    }
    s = {
        r["doc_id"]: r["shard"]
        for r in epoch_shuffle(d, epoch=4, n_shards=5).collect()
    }
    assert m == s


def test_reproducible_and_epoch_sensitive(spark):
    d = _df(spark)
    a = sorted(
        tuple(r)
        for r in training_manifest(
            d, epoch=1, context_len=16, n_shards=2
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in training_manifest(
            d, epoch=1, context_len=16, n_shards=2
        ).collect()
    )
    c = sorted(
        tuple(r)
        for r in training_manifest(
            d, epoch=2, context_len=16, n_shards=2
        ).collect()
    )
    assert a == b
    assert a != c  # a different epoch permutes


def test_packing_efficiency(spark):
    from hive_serde_schema_gen_spark.operators.packing import (
        packing_efficiency,
        training_manifest,
    )

    sel = spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(40)],
        "doc_id long, n_tokens int",
    )
    m = training_manifest(sel, epoch=1, context_len=64, n_shards=4)
    rows = {r["shard"]: r for r in packing_efficiency(m, 64).collect()}
    assert "__total" in rows and len(rows) == 5
    tot = rows["__total"]
    import math

    want_tokens = sum(10 + (i * 7) % 90 for i in range(40))
    assert tot["n_tokens"] == want_tokens
    # the __total row reconciles EXACTLY with the shard rows: packing
    # is per shard, so total windows = sum of per-shard ceilings (not
    # ceil(total/L), which would undercount shard-boundary padding)
    shard_windows = sum(
        r["n_windows"] for k, r in rows.items() if k != "__total"
    )
    assert tot["n_windows"] == shard_windows
    assert shard_windows >= math.ceil(want_tokens / 64)
    # padded layout can never waste less than packed
    for r in rows.values():
        assert r["padded_waste_frac"] >= r["packed_waste_frac"] - 1e-12
        assert 0.0 <= r["packed_waste_frac"] < 1.0
    # exact padded window count: sum of per-doc ceilings
    assert tot["padded_windows"] == sum(
        math.ceil((10 + (i * 7) % 90) / 64) for i in range(40)
    )
