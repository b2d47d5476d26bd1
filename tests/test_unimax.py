"""UniMax epoch-capped waterfilling budgets (`selection.unimax_budgets`):
the pinned properties — exact allocation, caps respected, fairness
(uncapped budgets within 1), monotonicity — plus hand cases and the
hypothesis sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_serde_schema_gen_spark.operators.selection import unimax_budgets

totals_st = st.dictionaries(
    st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4),
    st.integers(min_value=0, max_value=10**7),
    min_size=1,
    max_size=8,
)


@given(totals_st, st.integers(0, 10**8), st.integers(1, 5))
@settings(max_examples=300, deadline=None)
def test_properties(totals, budget, epochs):
    b = unimax_budgets(totals, budget, epochs, 1)
    caps = {s: t * epochs for s, t in totals.items() if t > 0}
    assert set(b) == set(caps)
    # exact allocation up to the feasible maximum
    assert sum(b.values()) == min(budget, sum(caps.values()))
    # caps respected
    assert all(b[s] <= caps[s] for s in b)
    # fairness: any two UNCAPPED domains differ by <= 1
    open_b = [v for s, v in b.items() if v < caps[s]]
    assert not open_b or max(open_b) - min(open_b) <= 1
    # a capped domain never holds less than an uncapped one would force
    if open_b:
        assert all(
            caps[s] <= max(open_b) + 1
            for s, v in b.items()
            if v == caps[s]
        )


@given(totals_st, st.integers(0, 10**6))
@settings(max_examples=150, deadline=None)
def test_monotone_in_budget(totals, budget):
    a = unimax_budgets(totals, budget)
    c = unimax_budgets(totals, budget + 1000)
    assert all(c[s] >= a[s] for s in a)


def test_hand_cases():
    t = {"a": 100, "b": 1000, "c": 10000}
    assert unimax_budgets(t, 3000) == {"a": 100, "b": 1000, "c": 1900}
    assert unimax_budgets(t, 3000, 4, 1) == {"a": 400, "b": 1300, "c": 1300}
    assert unimax_budgets(t, 10**6) == {"a": 100, "b": 1000, "c": 10000}
    # rational epoch cap: half an epoch
    assert unimax_budgets(t, 10**6, 1, 2) == {
        "a": 50, "b": 500, "c": 5000,
    }
    # zero-total domains drop out; empty input yields empty output
    assert unimax_budgets({"a": 0}, 100) == {}
    assert unimax_budgets({}, 100) == {}


def test_feeds_token_budget_mixture_contract():
    # budgets are always <= caps <= T_s at epochs=1, the
    # token_budget_mixture precondition (fill never wants more than
    # the domain holds)
    t = {"x": 123, "y": 456, "z": 789}
    b = unimax_budgets(t, 10**9, 1, 1)
    assert all(b[s] <= t[s] for s in b)
