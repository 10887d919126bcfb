"""Property tests: quantization laws (hypothesis, pure numpy) and a
random-RPN differential test (seeded generator, Spark vs a pure-Python
stack interpreter)."""

import math
import operator
import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bharatmlstack_spark.functions.quantize import (
    fp16_roundtrip_np,
    fp8e4m3_roundtrip_np,
    fp8e5m2_roundtrip_np,
)

finite_floats = st.floats(
    min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite_floats, min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_quantize_idempotent(xs):
    """q(q(x)) == q(x) for every codec (a projection must be idempotent)."""
    x = np.array(xs, dtype=np.float64)
    for q in (fp16_roundtrip_np, fp8e5m2_roundtrip_np, fp8e4m3_roundtrip_np):
        once = q(x)
        twice = q(once.astype(np.float64))
        np.testing.assert_array_equal(once, twice)


@given(finite_floats, finite_floats)
@settings(max_examples=200, deadline=None)
def test_quantize_monotone(a, b):
    """x <= y implies q(x) <= q(y) (rounding preserves order)."""
    lo, hi = sorted((a, b))
    x = np.array([lo, hi], dtype=np.float64)
    for q in (fp16_roundtrip_np, fp8e5m2_roundtrip_np, fp8e4m3_roundtrip_np):
        out = q(x)
        if not (np.isnan(out[0]) or np.isnan(out[1])):
            assert out[0] <= out[1]


@given(st.floats(min_value=-448, max_value=448, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_e4m3_error_bound(x):
    """Relative error of E4M3 rounding <= 2^-4 for normal-range values
    (3 mantissa bits -> half-ulp 2^-4)."""
    out = float(fp8e4m3_roundtrip_np(np.array([x]))[0])
    if abs(x) >= 0.015625:  # min normal
        assert not math.isnan(out)
        assert abs(out - x) <= abs(x) * 2**-4 + 1e-12


@given(st.floats(min_value=-57000, max_value=57000, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_e5m2_error_bound(x):
    """Relative error of E5M2 <= 2^-3 for normal-range values (2 mantissa
    bits)."""
    out = float(fp8e5m2_roundtrip_np(np.array([x]))[0])
    if abs(x) >= 6.1035156e-05:
        assert abs(out - x) <= abs(x) * 2**-3 + 1e-12


# ---------------------------------------------------------------------------
# RPN differential test: Spark compilation vs pure-Python interpreter
# ---------------------------------------------------------------------------

_BIN = {
    "+": operator.add,
    "-": operator.sub,
    "*": operator.mul,
    "^": lambda a, b: math.pow(a, b) if not (a < 0 and b != int(b)) else float("nan"),
    ">": lambda a, b: float(a > b),
    "<": lambda a, b: float(a < b),
    ">=": lambda a, b: float(a >= b),
    "<=": lambda a, b: float(a <= b),
    "==": lambda a, b: float(a == b),
    "min": min,
    "max": max,
}
_UN = {"abs": abs, "exp": math.exp}


def _py_eval(tokens, row):
    stack = []
    for t in tokens:
        if t in _BIN:
            b, a = stack.pop(), stack.pop()
            stack.append(_BIN[t](a, b))
        elif t in _UN:
            stack.append(_UN[t](stack.pop()))
        else:
            stack.append(row[t] if t in row else float(t))
    assert len(stack) == 1
    return stack[0]


def _random_rpn(rng, cols, depth=0):
    """Generate a random well-formed RPN token list (division/log excluded:
    their error domains are separately pinned in test_expressions)."""
    if depth > 3 or rng.random() < 0.35:
        if rng.random() < 0.6:
            return [rng.choice(cols)]
        return [str(round(rng.uniform(-5, 5), 3))]
    if rng.random() < 0.25:
        return _random_rpn(rng, cols, depth + 1) + [rng.choice(list(_UN))]
    op = rng.choice([o for o in _BIN if o not in ("^", "exp")])
    return (
        _random_rpn(rng, cols, depth + 1)
        + _random_rpn(rng, cols, depth + 1)
        + [op]
    )


def test_rpn_differential_vs_python(spark):
    """100 random expressions, Spark-compiled vs Python-interpreted, same
    rows — one collect for all."""
    from pyspark.sql import functions as F

    from bharatmlstack_spark.functions.expressions import rpn_to_column

    rng = random.Random(4242)
    cols = ["a", "b", "c"]
    rows = [
        {"a": rng.uniform(-10, 10), "b": rng.uniform(-10, 10), "c": rng.uniform(0.1, 5)}
        for _ in range(20)
    ]
    df = spark.createDataFrame([(r["a"], r["b"], r["c"]) for r in rows], cols)

    exprs = [_random_rpn(rng, cols) for _ in range(100)]
    select = [F.col(c) for c in cols] + [
        rpn_to_column(" ".join(toks), set(cols)).alias(f"e{i}")
        for i, toks in enumerate(exprs)
    ]
    out = df.select(*select).collect()
    for row_in, row_out in zip(rows, out):
        for i, toks in enumerate(exprs):
            expected = _py_eval(toks, row_in)
            got = row_out[f"e{i}"]
            if math.isnan(expected):
                assert got is None or math.isnan(got), (toks, got)
            else:
                assert got == pytest.approx(expected, rel=1e-12, abs=1e-12), (
                    " ".join(toks),
                    row_in,
                )


# ---------------------------------------------------------------------------
# connected components vs a driver-side union-find reference
# ---------------------------------------------------------------------------


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id reachable
    out = {}
    for n in nodes:
        r = find(n)
        out[n] = min(out.get(r, r), r)
    return {n: find(n) for n in nodes}


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    from bharatmlstack_spark.operators.graph import connected_components
    nodes = sorted({n for e in edges for n in e})
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    # union-find reference: label every node with min reachable id
    want = _union_find_components(edges, nodes)
    # normalize the reference to min-reachable labels
    comp_min = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[r] for n, r in want.items()}
    assert got == want


# ---------------------------------------------------------------------------
# sequence packing invariants
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(1, 300), min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_pack_sequences_invariants(spark, tokens):
    from bharatmlstack_spark.operators.chunking import pack_sequences
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], ["doc_id", "n_tokens"]
    )
    rows = pack_sequences(df, budget=256, n_shards=3).collect()
    assert len(rows) == len(tokens)  # every doc lands exactly once
    by_shard = {}
    for r in rows:
        assert r.shard == r.doc_id % 3
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in shard_rows:
            assert r.tokens_before == offset  # contiguous offsets per shard
            assert r.bin == offset // 256  # bin = start offset / budget
            offset += tokens[r.doc_id]


# ---------------------------------------------------------------------------
# protowire round-trip laws (pure python, no Spark)
# ---------------------------------------------------------------------------

_meta_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=40,
)


@given(
    st.text(min_size=1, max_size=20, alphabet=st.characters(codec="ascii", min_codepoint=48, max_codepoint=122)),
    st.lists(
        st.fixed_dictionaries(
            {
                "catalog_id": st.integers(0, 2**31 - 1),
                "product_id": st.integers(0, 2**31 - 1),
                "sub_order_num": _meta_text,
                "timestamp": st.integers(0, 2**62),
                "metadata": _meta_text,
            }
        ),
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_order_event_wire_round_trip(user_id, rows):
    """PersistOrderDataRequest encode∘decode == identity, including unicode
    strings, zero ints (proto3 default omission), and max-range varints."""
    from bharatmlstack_spark.functions import protowire

    wire = protowire.encode_event_request(user_id, rows, "order")
    back = protowire.decode_event_request(wire, "order")
    assert back["user_id"] == user_id
    assert len(back["data"]) == len(rows)
    for sent, got in zip(rows, back["data"]):
        for k, v in sent.items():
            assert got[k] == v, (k, v, got[k])


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "catalog_id": st.integers(0, 2**31 - 1),
                "product_id": st.integers(0, 2**31 - 1),
                "timestamp": st.integers(0, 2**62),
                "metadata": _meta_text,
            }
        ),
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_click_event_wire_round_trip(rows):
    from bharatmlstack_spark.functions import protowire

    wire = protowire.encode_event_request("u1", rows, "click")
    back = protowire.decode_event_request(wire, "click")
    assert len(back["data"]) == len(rows)
    for sent, got in zip(rows, back["data"]):
        for k, v in sent.items():
            assert got[k] == v


# ---------------------------------------------------------------------------
# registry JSON round-trip law (pure python)
# ---------------------------------------------------------------------------

_label = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=8,
)


@st.composite
def _registries(draw):
    from bharatmlstack_spark.registry import (
        DataType,
        Entity,
        Feature,
        FeatureGroup,
        SchemaRegistry,
    )

    reg = SchemaRegistry()
    n_entities = draw(st.integers(1, 3))
    used_entities = set()
    for _ in range(n_entities):
        elabel = draw(_label.filter(lambda s: s not in used_entities))
        used_entities.add(elabel)
        fgs = {}
        n_fgs = draw(st.integers(1, 4))
        for fg_id in range(1, n_fgs + 1):
            flabel = draw(_label.filter(lambda s: s not in fgs))
            dt = draw(st.sampled_from([
                DataType.INT32, DataType.INT64, DataType.FP32, DataType.FP64,
                DataType.STRING, DataType.BOOL, DataType.FP32_VECTOR,
            ]))
            feats = []
            n_feats = draw(st.integers(1, 4))
            used_feats = set()
            for idx in range(n_feats):
                fname = draw(_label.filter(lambda s: s not in used_feats))
                used_feats.add(fname)
                kw = {}
                if dt.is_vector:
                    kw["vector_length"] = draw(st.integers(1, 16))
                if dt == DataType.STRING:
                    kw["string_length"] = draw(st.integers(1, 64))
                    kw["default"] = draw(st.text(max_size=8))
                feats.append(Feature(fname, idx, **kw))
            fgs[flabel] = FeatureGroup(
                flabel, fg_id, dt, {1: feats},
                ttl_seconds=draw(st.integers(0, 10**7)),
                store_id=draw(st.integers(0, 3)),
            )
        reg.register(Entity(label=elabel, key_columns=["k"], feature_groups=fgs))
    return reg


@given(_registries())
@settings(max_examples=60, deadline=None)
def test_registry_json_round_trip(reg):
    """to_json ∘ from_json is the identity on the JSON form for arbitrary
    registries (types, vectors, string defaults, TTLs, store routing)."""
    from bharatmlstack_spark.registry import SchemaRegistry

    blob = reg.to_json()
    back = SchemaRegistry.from_json(blob)
    assert back.to_json() == blob
    for e in reg.entities():
        orig, rt = reg.entity(e), back.entity(e)
        assert sorted(orig.feature_groups) == sorted(rt.feature_groups)
        for fg_label, fg in orig.feature_groups.items():
            assert rt.fg(fg_label).data_type == fg.data_type
            assert rt.fg(fg_label).ttl_seconds == fg.ttl_seconds
            assert rt.fg(fg_label).store_id == fg.store_id


# ---------------------------------------------------------------------------
# narrow-storage codec laws: decode∘encode == roundtrip (pure numpy)
# ---------------------------------------------------------------------------

@given(st.lists(finite_floats, min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_narrow_storage_encode_decode_law(xs):
    """The SMALLINT/TINYINT storage path must be value-identical to the
    in-memory roundtrip: decode(encode(x)) == roundtrip(x) bit-for-bit,
    for every format (fp16, E5M2, E4M3FN) on arbitrary finite floats."""
    import numpy as np

    from bharatmlstack_spark.functions import quantize as Q

    x = np.array(xs, dtype=np.float32)
    for enc, dec, rt in [
        (Q.fp16_encode_np, Q.fp16_decode_np, Q.fp16_roundtrip_np),
        (Q.fp8e5m2_encode_np, Q.fp8e5m2_decode_np, Q.fp8e5m2_roundtrip_np),
        (Q.fp8e4m3_encode_np, Q.fp8e4m3_decode_np, Q.fp8e4m3_roundtrip_np),
    ]:
        stored = dec(enc(x))
        direct = rt(x)
        assert np.array_equal(
            stored.astype(np.float32).view(np.uint32),
            np.asarray(direct, dtype=np.float32).view(np.uint32),
        ), (enc.__name__, x)
