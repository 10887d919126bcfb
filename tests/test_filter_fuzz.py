"""Property-fuzz the payload-filter compiler (operators/knn.py FilterSpec,
P6/P7) against a row-at-a-time Python reference.

The reference's 12 filter operators (filters.go:54-191) compile to
Catalyst predicates; the fixed-case tests in test_knn.py pin one example
per operator. Here arbitrary conjunctions of typed specs run over a frame
with NULLs, asserting Spark's three-valued filter semantics match the
reference evaluator: a NULL comparison is not-matched (filtered out), NIN
over a NULL field is not-matched, EX is the null test itself.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bharatmlstack_spark.operators.knn import FilterSpec, compile_filters

ROWS = [
    # (id, i, f, s) with NULLs sprinkled through every column
    (0, None, None, None),
    (1, 0, 0.0, ""),
    (2, 1, 0.5, "alpha"),
    (3, 2, -1.5, "beta"),
    (4, 5, 2.5, "alphabet"),
    (5, -3, 100.0, "gamma"),
    (6, 7, None, "beta max"),
    (7, None, 3.25, "ALPHA"),
    (8, 10, -0.5, None),
    (9, 4, 4.0, "delta"),
]

INT_POOL = [-3, 0, 1, 2, 4, 5, 7, 10, 42]
FLOAT_POOL = [-1.5, -0.5, 0.0, 0.5, 2.5, 3.25, 4.0, 100.0]
STR_POOL = ["", "alpha", "beta", "ALPHA", "delta", "zzz", "a"]


def _spec_for(field: str, draw) -> FilterSpec:
    if field == "s":
        op = draw(st.sampled_from(["IN", "NIN", "EX", "SEARCH"]))
        if op == "SEARCH":
            return FilterSpec("s", op, [draw(st.sampled_from(STR_POOL))])
        vals = draw(st.lists(st.sampled_from(STR_POOL), min_size=1, max_size=3))
        return FilterSpec("s", op, vals)
    pool = INT_POOL if field == "i" else FLOAT_POOL
    op = draw(
        st.sampled_from(["IN", "NIN", "EX", "LT", "LTE", "GT", "GTE", "BTW", "BTWE"])
    )
    if op in ("BTW", "BTWE"):
        lo = draw(st.sampled_from(pool))
        hi = draw(st.sampled_from(pool))
        return FilterSpec(field, op, [min(lo, hi), max(lo, hi)])
    if op in ("IN", "NIN"):
        vals = draw(st.lists(st.sampled_from(pool), min_size=1, max_size=3))
        return FilterSpec(field, op, vals)
    return FilterSpec(field, op, [draw(st.sampled_from(pool))])


def ref_match(row: dict, spec: FilterSpec) -> bool:
    """Three-valued semantics collapsed to match/not-match (a NULL
    predicate result filters the row out, as Spark's filter does)."""
    v = row[spec.field]
    op = spec.op
    if op == "EX":
        return v is not None
    if v is None:
        return False  # every other operator is NULL on a NULL field
    if op == "IN":
        return v in spec.values
    if op == "NIN":
        return v not in spec.values
    if op == "SEARCH":
        return str(spec.values[0]) in v
    if op == "LT":
        return v < spec.values[0]
    if op == "LTE":
        return v <= spec.values[0]
    if op == "GT":
        return v > spec.values[0]
    if op == "GTE":
        return v >= spec.values[0]
    if op == "BTW":
        return spec.values[0] < v < spec.values[1]
    if op == "BTWE":
        return spec.values[0] <= v <= spec.values[1]
    raise AssertionError(op)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "id int, i int, f double, s string"
    ).cache()


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_filter_conjunction_matches_reference(spark, frame, data):
    n_specs = data.draw(st.integers(1, 3))
    specs = [
        _spec_for(data.draw(st.sampled_from(["i", "f", "s"])), data.draw)
        for _ in range(n_specs)
    ]
    # split arbitrarily into per-query + global halves (P7 merges them)
    cut = data.draw(st.integers(0, n_specs))
    pred = compile_filters(specs[:cut], specs[cut:])
    got = sorted(r["id"] for r in frame.filter(pred).collect())
    cols = ("id", "i", "f", "s")
    want = sorted(
        row[0]
        for row in ROWS
        if all(ref_match(dict(zip(cols, row)), s) for s in specs)
    )
    assert got == want, f"specs={[(s.field, s.op, s.values) for s in specs]}"


def test_compile_filters_empty_is_none():
    assert compile_filters(None) is None
    assert compile_filters([], []) is None


def test_unknown_operator_raises():
    with pytest.raises(ValueError, match="unsupported filter operator"):
        FilterSpec("i", "LIKE", [1]).to_column()
