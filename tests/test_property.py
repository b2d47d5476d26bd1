"""Property-based tests for the merge lattice (SURVEY §5): associativity,
commutativity-of-type, idempotence — the laws that make the distributed
partial/final aggregation correct regardless of partitioning."""

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_serde_schema_gen_spark.schema_infer import (
    Arr,
    Descriptor,
    Num,
    Str,
    Struct,
    describe,
    merge,
    render_type,
)

# Field name decides the value kind, so randomly-built objects always merge
# cleanly (kind conflicts are covered by the explicit error tests).
KIND_POOL = {
    "i": st.integers(min_value=-(10**20), max_value=10**20),
    "f": st.decimals(
        min_value=Decimal("-1e12"),
        max_value=Decimal("1e12"),
        allow_nan=False,
        allow_infinity=False,
        places=6,
    ),
    "s": st.text(max_size=30),
    "b": st.booleans(),
    "n": st.none(),
}


def value_strategy(depth: int = 2):
    scalar_keys = list(KIND_POOL)
    if depth == 0:
        kinds = [KIND_POOL[k] for k in scalar_keys]
        return st.one_of(*kinds)
    sub = value_strategy(depth - 1)
    # list elements must be kind-consistent: draw one scalar kind per list
    homogeneous_list = st.sampled_from(scalar_keys).flatmap(
        lambda k: st.lists(KIND_POOL[k] | st.none(), max_size=4)
    )
    obj = st.dictionaries(
        st.sampled_from(scalar_keys), sub, max_size=4
    ).map(lambda d: {f"{k}_{i}": v for i, (k, v) in enumerate(d.items())})
    return st.one_of(*[KIND_POOL[k] for k in scalar_keys], homogeneous_list, obj)


def row_strategy():
    """Rows are objects whose field name prefix pins the field's kind."""
    return st.dictionaries(
        st.sampled_from(list(KIND_POOL)),
        st.nothing() | st.none(),
        max_size=0,
    ).flatmap(
        lambda _: st.fixed_dictionaries(
            {},
            optional={
                f"{k}1": KIND_POOL[k] for k in KIND_POOL
            },
        )
    )


def canonical(d: Descriptor) -> str:
    """Type identity modulo struct field order."""
    if isinstance(d, Struct):
        return (
            "struct{"
            + ",".join(f"{k}:{canonical(v)}" for k, v in sorted(d.fields.items()))
            + "}"
        )
    if isinstance(d, Arr):
        return f"array<{canonical(d.element)}>"
    if isinstance(d, (Num, Str)):
        return render_type(d)
    return d.kind


@settings(max_examples=200, deadline=None)
@given(row_strategy(), row_strategy(), row_strategy())
def test_merge_associative(a, b, c):
    da, db, dc = describe(a), describe(b), describe(c)
    left = merge(merge(da, db), dc)
    right = merge(da, merge(db, dc))
    assert canonical(left) == canonical(right)


@settings(max_examples=200, deadline=None)
@given(row_strategy(), row_strategy())
def test_merge_commutative_type(a, b):
    da, db = describe(a), describe(b)
    assert canonical(merge(da, db)) == canonical(merge(db, da))


@settings(max_examples=200, deadline=None)
@given(value_strategy())
def test_describe_idempotent_under_self_merge(v):
    d = describe(v)
    assert canonical(merge(d, d)) == canonical(d)


@settings(max_examples=100, deadline=None)
@given(st.lists(row_strategy(), min_size=1, max_size=8))
def test_fold_order_independent_type(rows):
    """Any partitioning of the fold yields the same type — the law the
    distributed partial/final aggregation rests on."""
    descs = [describe(r) for r in rows]
    seq = descs[0]
    for d in descs[1:]:
        seq = merge(seq, d)
    rev = descs[-1]
    for d in reversed(descs[:-1]):
        rev = merge(rev, d)
    assert canonical(seq) == canonical(rev)


@settings(max_examples=300, deadline=None)
@given(st.lists(row_strategy(), max_size=12))
def test_fast_batch_fold_matches_row_fold(rows):
    """The accumulator fast path must produce the exact descriptor (bounds,
    scales, lengths, field order included — not just the rendered type) of
    the row-at-a-time fold, or fall back by raising _FastPathMiss."""
    from hive_serde_schema_gen_spark.schema_infer.infer import (
        _FastPathMiss,
        _fold_values_fast,
    )
    from hive_serde_schema_gen_spark.schema_infer.lattice import (
        EMPTY_STRUCT,
        observe,
    )

    slow = EMPTY_STRUCT
    for r in rows:
        slow = observe(slow, r)
    try:
        fast = _fold_values_fast(EMPTY_STRUCT, rows)
    except _FastPathMiss:
        return  # fallback is exercised by the flat-only variant below
    assert fast == slow
    assert list(fast.fields) == list(slow.fields)  # first-seen order


FLAT_ROW = st.fixed_dictionaries(
    {}, optional={f"{k}1": KIND_POOL[k] for k in KIND_POOL}
)


@settings(max_examples=300, deadline=None)
@given(st.lists(FLAT_ROW, min_size=1, max_size=12))
def test_fast_batch_fold_covers_flat_rows(rows):
    """Flat scalar rows must never miss the fast path (that's the shape it
    exists for) and must reproduce the slow fold exactly."""
    from hive_serde_schema_gen_spark.schema_infer.infer import _fold_values_fast
    from hive_serde_schema_gen_spark.schema_infer.lattice import (
        EMPTY_STRUCT,
        observe,
    )

    slow = EMPTY_STRUCT
    for r in rows:
        slow = observe(slow, r)
    fast = _fold_values_fast(EMPTY_STRUCT, rows)
    assert fast == slow
    assert list(fast.fields) == list(slow.fields)
