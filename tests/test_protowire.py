"""Protobuf persist.Query wire format: pure-codec round trip + Spark
decode -> persist -> retrieve round trip (batch and streaming), mirroring
the py-sdk push client's encoding (client.py:47-150) in reverse."""

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark import fixtures
from bharatmlstack_spark.functions import protowire as pw


def _sample_query():
    # what the py-sdk client would emit for two user rows with every FG kind
    fg_schemas = [
        ("demo_int32", ["age"]),
        ("demo_fp", ["acct_bal"]),
        ("demo_str", ["location", "subscription_type"]),
        ("demo_bool", ["is_active"]),
        ("demo_vec", ["taste_vec"]),
    ]
    data = [
        {
            "key_values": ["1"],
            "feature_values": [
                {"int32_values": [34]},
                {"fp32_values": [12.5]},
                {"string_values": ["blr", "premium"]},
                {"bool_values": [True]},
                {"vector": [{"fp32_values": [0.5, 0.25, -1.0, 2.0, 0.0, 1.0, 3.5, -0.5]}]},
            ],
        },
        {
            "key_values": ["2"],
            "feature_values": [
                {"int32_values": [-7]},  # negative int32 exercises varint 2c
                {"fp32_values": [-3.25]},
                {"string_values": ["del", "none"]},
                {"bool_values": [False]},
                {"vector": [{"fp32_values": [1.0] * 8}]},
            ],
        },
    ]
    return ("user", ["user_id"], fg_schemas, data)


def test_codec_round_trip():
    entity, keys, fgs, data = _sample_query()
    wire = pw.encode_query(entity, keys, fgs, data)
    q = pw.decode_query(wire)
    assert q["entity_label"] == "user"
    assert q["keys_schema"] == ["user_id"]
    assert q["fg_schemas"] == fgs
    assert q["data"][0]["key_values"] == ["1"]
    assert q["data"][0]["feature_values"][0]["int32_values"] == [34]
    assert q["data"][1]["feature_values"][0]["int32_values"] == [-7]
    assert q["data"][0]["feature_values"][2]["string_values"] == ["blr", "premium"]
    assert q["data"][1]["feature_values"][3]["bool_values"] == [False]
    assert q["data"][0]["feature_values"][4]["vector"][0]["fp32_values"][2] == -1.0


def test_codec_unpacked_ints_accepted():
    # some encoders emit unpacked repeated ints; decoder must accept both
    body = pw._tag(3, 0) + pw._enc_varint(5) + pw._tag(3, 0) + pw._enc_varint(7)
    assert pw.decode_values(bytes(body))["int32_values"] == [5, 7]


def test_codec_rejects_malformed():
    with pytest.raises(ValueError):
        pw.decode_values(b"\xff" * 12)  # runaway varint


def test_spark_decode_persist_retrieve_round_trip(spark, tmp_path):
    """The full reference ingest path: py-sdk-style protobuf encode ->
    distributed decode -> FeatureStore.persist -> green retrieve."""
    from bharatmlstack_spark.operators.feature_store import FeatureStore
    from bharatmlstack_spark.streaming.ingest import decode_persist_queries

    wire = pw.encode_query(*_sample_query())
    payloads = spark.createDataFrame([(wire,)], "value binary")
    decoded = decode_persist_queries(
        payloads, fixtures.user_registry(), "user", key_types={"user_id": "bigint"}
    )
    fs = FeatureStore(spark, fixtures.user_registry(), str(tmp_path / "pbfeat"))
    fs.persist("user", decoded)

    from pyspark.sql import functions as F

    keys = spark.createDataFrame([(1,), (2,)], ["user_id"])
    out = fs.retrieve(
        "user",
        {
            "demo_int32": ["age"],
            "demo_str": ["location"],
            "demo_vec": ["taste_vec"],
            "demo_bool": ["is_active"],
        },
        keys,
        now=F.lit(fixtures.FIXED_NOW).cast("timestamp"),
    )
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[1]["demo_int32__age"] == 34
    assert rows[2]["demo_int32__age"] == -7
    assert rows[1]["demo_str__location"] == "blr"
    assert rows[2]["demo_bool__is_active"] is False
    assert rows[1]["demo_vec__taste_vec"][2] == -1.0
    assert len(rows[2]["demo_vec__taste_vec"]) == 8


def test_streaming_protobuf_ingest(spark, tmp_path):
    """SS1 with the real wire format: a stream of persist.Query payloads
    decoded + upserted per micro-batch; retrieve sees the features."""
    from bharatmlstack_spark.operators.feature_store import FeatureStore
    from bharatmlstack_spark.streaming.ingest import (
        decode_persist_queries,
        feature_upsert_sink,
    )

    src = str(tmp_path / "pb_src")
    wire = pw.encode_query(*_sample_query())
    spark.createDataFrame([(wire,)], "value binary").write.parquet(src)

    stream = spark.readStream.schema("value binary").parquet(src)
    decoded = decode_persist_queries(
        stream, fixtures.user_registry(), "user", key_types={"user_id": "bigint"}
    )
    fs = FeatureStore(spark, fixtures.user_registry(), str(tmp_path / "pbfeat2"))
    q = feature_upsert_sink(
        decoded, fs, "user", str(tmp_path / "pb_ck"), trigger_once=True
    )
    q.awaitTermination(120)

    rows = {r["user_id"]: r for r in fs.load("user").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["demo_fp__acct_bal"] == 12.5


def test_event_request_codec_round_trip():
    """time_series.proto ClickData/OrderData round trip, incl proto3
    defaults (zero ints / empty strings write no bytes) and negatives."""
    clicks = [
        {"catalog_id": 5, "product_id": 77, "timestamp": 1700000000123, "metadata": '{"p":1}'},
        {"catalog_id": 0, "product_id": -3, "timestamp": 0, "metadata": ""},
    ]
    got = pw.decode_event_request(pw.encode_event_request("u42", clicks, "click"), "click")
    assert got == {"user_id": "u42", "data": clicks}

    orders = [{"catalog_id": 9, "product_id": 8, "sub_order_num": "SO-1",
               "timestamp": 1700000000999, "metadata": "m"}]
    got = pw.decode_event_request(pw.encode_event_request("u1", orders, "order"), "order")
    assert got == {"user_id": "u1", "data": orders}


def test_streaming_event_protobuf_ingest(spark, tmp_path):
    """S5 end-to-end: click+order persist requests on the wire -> streamed
    decode -> retention merge -> the events land typed and trimmed (the
    events_range_user shape: per-user time-ordered retrieval)."""
    from bharatmlstack_spark.operators.event_store import EventStore
    from bharatmlstack_spark.streaming.ingest import (
        decode_event_requests,
        stream_event_retention,
    )

    clicks = [
        {"catalog_id": 1, "product_id": 10 + i, "timestamp": 1700000000000 + i * 3600_000,
         "metadata": f"c{i}"}
        for i in range(5)
    ]
    src = str(tmp_path / "click_src")
    wire = pw.encode_event_request("7", clicks, "click")
    spark.createDataFrame([(wire,)], "value binary").write.parquet(src)

    stream = spark.readStream.schema("value binary").parquet(src)
    decoded = decode_event_requests(stream, "click").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("product_id").cast("bigint").alias("event_id"),
        F.timestamp_millis(F.col("timestamp")).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    store = EventStore(ts_col="ts", max_per_week=3)
    state = str(tmp_path / "ev_state")
    q = stream_event_retention(
        decoded, store, state, str(tmp_path / "ev_ck"), spark, trigger_once=True
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(state).collect()
    assert len(rows) == 3  # per-week trim kept the newest 3
    assert sorted(r["event_id"] for r in rows) == [12, 13, 14]
    assert all(r["user_id"] == 7 for r in rows)


# ---------------------------------------------------------------------------
# wire-codec roundtrip fuzz (pure Python, no Spark)
# ---------------------------------------------------------------------------

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

_i64 = st.one_of(
    st.integers(-(1 << 63), (1 << 63) - 1),
    st.sampled_from([0, -1, 1, -(1 << 63), (1 << 63) - 1, 127, 128, -128]),
)
_u64 = st.one_of(
    st.integers(0, (1 << 64) - 1),
    st.sampled_from([0, 1, 127, 128, (1 << 64) - 1, (1 << 63)]),
)
_f64 = st.one_of(
    st.floats(allow_nan=False, width=64),
    st.sampled_from([0.0, -0.0, float("inf"), float("-inf"), 5e-324, 1.5]),
)
_values = st.fixed_dictionaries(
    {},
    optional={
        "fp32_values": st.lists(_f64, max_size=4),
        "fp64_values": st.lists(_f64, max_size=4),
        "int32_values": st.lists(_i64, max_size=4),
        "int64_values": st.lists(_i64, max_size=4),
        "uint32_values": st.lists(_u64, max_size=4),
        "uint64_values": st.lists(_u64, max_size=4),
        "string_values": st.lists(st.text(max_size=8), max_size=3),
        "bool_values": st.lists(st.booleans(), max_size=4),
    },
)


def _norm(v: dict) -> dict:
    out = {}
    for k, vals in v.items():
        if not vals:
            continue  # encoder omits empty fields; decoder never emits them
        if k in ("fp32_values", "fp64_values"):
            out[k] = [struct.pack("<d", float(x)) for x in vals]
        else:
            out[k] = list(vals)
    return out


@settings(max_examples=200, deadline=None)
@given(_values, _values)
def test_values_codec_roundtrip_fuzz(v, inner):
    """encode_values/decode_values must be a lossless pair across the full
    int64/uint64 domain (varint two's-complement boundaries), double
    bit-patterns (+-0.0, infinities, subnormals), unicode strings, bools,
    and one level of Vector nesting."""
    msg = dict(v)
    if inner:
        msg["vector"] = [inner]
    got = pw.decode_values(pw.encode_values(msg))
    assert _norm({k: x for k, x in got.items() if k != "vector"}) == _norm(
        {k: x for k, x in msg.items() if k != "vector"}
    )
    want_vec = msg.get("vector") or []  # empty Values still encode an entry
    got_vec = got.get("vector") or []
    assert len(got_vec) == len(want_vec)
    for g, w in zip(got_vec, want_vec):
        assert _norm(g) == _norm(w)


_evt_i32 = st.one_of(st.integers(-(1 << 31), (1 << 31) - 1), st.sampled_from([0, 1, -1]))
_evt_row_click = st.fixed_dictionaries(
    {},
    optional={
        "catalog_id": _evt_i32,
        "product_id": _evt_i32,
        "timestamp": _i64,
        "metadata": st.text(max_size=8),
    },
)
_evt_row_order = st.fixed_dictionaries(
    {},
    optional={
        "catalog_id": _evt_i32,
        "product_id": _evt_i32,
        "sub_order_num": st.text(max_size=6),
        "timestamp": _i64,
        "metadata": st.text(max_size=8),
    },
)


@settings(max_examples=150, deadline=None)
@given(
    st.text(max_size=8),
    st.lists(_evt_row_click, max_size=4),
    st.lists(_evt_row_order, max_size=4),
)
def test_event_request_codec_roundtrip_fuzz(user_id, clicks, orders):
    """encode/decode_event_request roundtrip under proto3 default
    elision: zero ints and empty strings write no bytes and decode back
    to the scalar defaults — the decoded row is always the FULL field
    set with absent fields defaulted."""
    for kind, rows, fields in (
        ("click", clicks, pw.CLICK_DATA_FIELDS),
        ("order", orders, pw.ORDER_DATA_FIELDS),
    ):
        wire = pw.encode_event_request(user_id, rows, kind)
        got = pw.decode_event_request(wire, kind)
        assert got["user_id"] == user_id
        assert len(got["data"]) == len(rows)
        for g, w in zip(got["data"], rows):
            for _, (name, k) in fields.items():
                default = "" if k == "string" else 0
                want = w.get(name) or default
                assert g[name] == want, (kind, name, w)


def test_spark_decode_string_vector_round_trip(spark, tmp_path):
    """STRING_VECTOR over the wire: the Values message nests string
    vectors as vector=[{string_values: [...]}] (persist.proto Values
    field 9 wrapping field 7) — decode -> persist -> retrieve_decoded
    returns the ':'-joined tags."""
    from bharatmlstack_spark.operators.feature_store import FeatureStore
    from bharatmlstack_spark.streaming.ingest import decode_persist_queries

    fg_schemas = [("demo_tags", ["tags"])]
    data = [
        {
            "key_values": ["1"],
            "feature_values": [{"vector": [{"string_values": ["red", "seg1", "nat4"]}]}],
        },
        {
            "key_values": ["2"],
            "feature_values": [{"vector": [{"string_values": ["blue", "seg2", "nat9"]}]}],
        },
    ]
    wire = pw.encode_query("user", ["user_id"], fg_schemas, data)
    q = pw.decode_query(wire)
    assert q["data"][0]["feature_values"][0]["vector"][0]["string_values"] == [
        "red", "seg1", "nat4",
    ]

    payloads = spark.createDataFrame([(wire,)], "value binary")
    reg = fixtures.user_tags_registry()
    decoded = decode_persist_queries(
        payloads, reg, "user", key_types={"user_id": "bigint"}
    )
    fs = FeatureStore(spark, reg, str(tmp_path / "pbtags"), n_buckets=4)
    fs.persist("user", decoded)
    keys = spark.createDataFrame([(1,), (2,), (3,)], ["user_id"])
    out = {
        r["user_id"]: r["demo_tags__tags"]
        for r in fs.retrieve_decoded("user", {"demo_tags": ["tags"]}, keys).collect()
    }
    assert out[1] == "red:seg1:nat4"
    assert out[2] == "blue:seg2:nat9"
    assert out[3] == "none:none:none"  # default fill for the miss


from hypothesis import given, settings
from hypothesis import strategies as st

# arbitrary unicode (no surrogates — invalid utf-8), incl. multibyte
_STR = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
)


@settings(max_examples=100, deadline=None)
@given(vecs=st.lists(st.lists(_STR, min_size=1, max_size=5), min_size=1, max_size=4))
def test_fuzz_string_vector_wire_roundtrip(vecs):
    """Values{vector=[{string_values}]} survives encode->decode for
    arbitrary unicode content — the StringVector wire path (utf-8 byte
    lengths on the wire, codepoints at the API)."""
    payload = {"vector": [{"string_values": v} for v in vecs]}
    out = pw.decode_values(pw.encode_values(payload))
    assert [x.get("string_values", []) for x in out["vector"]] == vecs
