"""Minimal proto3 wire codec for the feature-persist message family.

The reference's Kafka payload is a protobuf ``persist.Query``
(online-feature-store/pkg/proto/persist.proto:5-41):

    Query{ entity_label=1, keys_schema=2 (repeated string),
           feature_group_schema=3 (repeated FeatureGroupSchema),
           data=4 (repeated Data) }
    FeatureGroupSchema{ label=1, feature_labels=2 }
    Data{ key_values=1 (repeated string), feature_values=2 (repeated
          FeatureValues) }  -- feature_values aligns 1:1 with
          feature_group_schema order
    FeatureValues{ values=1 (Values) }
    Values{ fp32_values=1 / fp64_values=2 (repeated double),
            int32_values=3 / int64_values=4, uint32_values=5 /
            uint64_values=6, string_values=7, bool_values=8,
            vector=9 (repeated Vector) }
    Vector{ values=1 (Values) }

This module implements exactly that schema on the raw proto3 wire format
(varint / fixed64 / length-delimited — a public, stable spec), because the
sandbox has neither the ``protobuf`` package nor the spark-protobuf jar.
The encoder mirrors the py-sdk Spark push client
(py-sdk/spark_feature_push_client/spark_feature_push_client/client.py:47-150)
so a round-trip pytest pins wire compatibility in both directions. Scalar
numeric fields accept BOTH packed (proto3 default) and unpacked encodings
on decode, so payloads from any standard protobuf library parse.

Messages are plain dicts; no generated classes.
"""

from __future__ import annotations

import struct

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _enc_varint(n: int) -> bytes:
    if n < 0:  # two's-complement 64-bit (proto int32/int64 negative)
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _tag(field: int, wiretype: int) -> bytes:
    return _enc_varint((field << 3) | wiretype)


def _enc_len(field: int, payload: bytes) -> bytes:
    return _tag(field, _WT_LEN) + _enc_varint(len(payload)) + payload


def _signed(n: int, bits: int = 64) -> int:
    """Undo two's-complement for int32/int64 fields."""
    if n >= 1 << (bits - 1):
        n -= 1 << bits
    return n


# ---------------------------------------------------------------------------
# Values (persist.proto:20-30)
# ---------------------------------------------------------------------------

_DOUBLE_FIELDS = {1: "fp32_values", 2: "fp64_values"}
_INT_FIELDS = {3: "int32_values", 4: "int64_values"}
_UINT_FIELDS = {5: "uint32_values", 6: "uint64_values"}


def encode_values(v: dict) -> bytes:
    """``v`` maps field names (fp32_values, ..., vector) to lists."""
    out = bytearray()
    for field, name in _DOUBLE_FIELDS.items():
        vals = v.get(name) or []
        if vals:  # packed doubles
            payload = b"".join(struct.pack("<d", float(x)) for x in vals)
            out += _enc_len(field, payload)
    for field, name in {**_INT_FIELDS, **_UINT_FIELDS}.items():
        vals = v.get(name) or []
        if vals:  # packed varints
            payload = b"".join(_enc_varint(int(x)) for x in vals)
            out += _enc_len(field, payload)
    for s in v.get("string_values") or []:
        out += _enc_len(7, str(s).encode("utf-8"))
    bools = v.get("bool_values") or []
    if bools:
        out += _enc_len(8, b"".join(_enc_varint(1 if b else 0) for b in bools))
    for vec in v.get("vector") or []:
        # Vector{values=1 Values}
        out += _enc_len(9, _enc_len(1, encode_values(vec)))
    return bytes(out)


def decode_values(buf: bytes) -> dict:
    v: dict = {}
    pos = 0
    while pos < len(buf):
        key, pos = _dec_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if field in _DOUBLE_FIELDS:
            name = _DOUBLE_FIELDS[field]
            lst = v.setdefault(name, [])
            if wt == _WT_LEN:  # packed
                ln, pos = _dec_varint(buf, pos)
                for off in range(pos, pos + ln, 8):
                    lst.append(struct.unpack_from("<d", buf, off)[0])
                pos += ln
            elif wt == _WT_FIXED64:
                lst.append(struct.unpack_from("<d", buf, pos)[0])
                pos += 8
            else:
                raise ValueError(f"bad wiretype {wt} for double field {field}")
        elif field in _INT_FIELDS or field in _UINT_FIELDS:
            signed = field in _INT_FIELDS
            name = _INT_FIELDS.get(field) or _UINT_FIELDS[field]
            lst = v.setdefault(name, [])
            if wt == _WT_LEN:  # packed
                ln, pos = _dec_varint(buf, pos)
                end = pos + ln
                while pos < end:
                    n, pos = _dec_varint(buf, pos)
                    lst.append(_signed(n) if signed else n)
            elif wt == _WT_VARINT:
                n, pos = _dec_varint(buf, pos)
                lst.append(_signed(n) if signed else n)
            else:
                raise ValueError(f"bad wiretype {wt} for int field {field}")
        elif field == 7:  # string_values
            ln, pos = _dec_varint(buf, pos)
            v.setdefault("string_values", []).append(
                buf[pos : pos + ln].decode("utf-8")
            )
            pos += ln
        elif field == 8:  # bool_values
            lst = v.setdefault("bool_values", [])
            if wt == _WT_LEN:
                ln, pos = _dec_varint(buf, pos)
                end = pos + ln
                while pos < end:
                    n, pos = _dec_varint(buf, pos)
                    lst.append(bool(n))
            else:
                n, pos = _dec_varint(buf, pos)
                lst.append(bool(n))
        elif field == 9:  # vector (repeated message)
            ln, pos = _dec_varint(buf, pos)
            inner = buf[pos : pos + ln]
            pos += ln
            # Vector{values=1 Values}
            vec: dict = {}
            ipos = 0
            while ipos < len(inner):
                ikey, ipos = _dec_varint(inner, ipos)
                if ikey >> 3 == 1 and ikey & 7 == _WT_LEN:
                    iln, ipos = _dec_varint(inner, ipos)
                    vec = decode_values(inner[ipos : ipos + iln])
                    ipos += iln
                else:
                    raise ValueError("unexpected field in Vector")
            v.setdefault("vector", []).append(vec)
        else:
            raise ValueError(f"unknown Values field {field}")
    return v


# ---------------------------------------------------------------------------
# Query / Data / FeatureGroupSchema (persist.proto:5-41)
# ---------------------------------------------------------------------------


def encode_query(
    entity_label: str,
    keys_schema: list[str],
    fg_schemas: list[tuple[str, list[str]]],
    data: list[dict],
) -> bytes:
    """``data``: each row is {"key_values": [str...], "feature_values":
    [values_dict per FG, aligned with fg_schemas order]}."""
    out = bytearray()
    out += _enc_len(1, entity_label.encode("utf-8"))
    for k in keys_schema:
        out += _enc_len(2, k.encode("utf-8"))
    for label, feats in fg_schemas:
        fg = bytearray()
        fg += _enc_len(1, label.encode("utf-8"))
        for f in feats:
            fg += _enc_len(2, f.encode("utf-8"))
        out += _enc_len(3, bytes(fg))
    for row in data:
        d = bytearray()
        for kv in row["key_values"]:
            d += _enc_len(1, str(kv).encode("utf-8"))
        for values in row["feature_values"]:
            # Data.feature_values = FeatureValues{values=1 Values}
            d += _enc_len(2, _enc_len(1, encode_values(values)))
        out += _enc_len(4, bytes(d))
    return bytes(out)


def decode_query(buf: bytes) -> dict:
    q: dict = {"entity_label": "", "keys_schema": [], "fg_schemas": [], "data": []}
    pos = 0
    while pos < len(buf):
        key, pos = _dec_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt != _WT_LEN:
            raise ValueError(f"unexpected wiretype {wt} in Query")
        ln, pos = _dec_varint(buf, pos)
        payload = buf[pos : pos + ln]
        pos += ln
        if field == 1:
            q["entity_label"] = payload.decode("utf-8")
        elif field == 2:
            q["keys_schema"].append(payload.decode("utf-8"))
        elif field == 3:
            label, feats = "", []
            ipos = 0
            while ipos < len(payload):
                ikey, ipos = _dec_varint(payload, ipos)
                iln, ipos = _dec_varint(payload, ipos)
                chunk = payload[ipos : ipos + iln]
                ipos += iln
                if ikey >> 3 == 1:
                    label = chunk.decode("utf-8")
                elif ikey >> 3 == 2:
                    feats.append(chunk.decode("utf-8"))
            q["fg_schemas"].append((label, feats))
        elif field == 4:
            row = {"key_values": [], "feature_values": []}
            ipos = 0
            while ipos < len(payload):
                ikey, ipos = _dec_varint(payload, ipos)
                iln, ipos = _dec_varint(payload, ipos)
                chunk = payload[ipos : ipos + iln]
                ipos += iln
                if ikey >> 3 == 1:
                    row["key_values"].append(chunk.decode("utf-8"))
                elif ikey >> 3 == 2:
                    # FeatureValues{values=1 Values}
                    vals: dict = {}
                    jpos = 0
                    while jpos < len(chunk):
                        jkey, jpos = _dec_varint(chunk, jpos)
                        jln, jpos = _dec_varint(chunk, jpos)
                        if jkey >> 3 == 1:
                            vals = decode_values(chunk[jpos : jpos + jln])
                        jpos += jln
                    row["feature_values"].append(vals)
            q["data"].append(row)
    return q


# ---------------------------------------------------------------------------
# interaction-store time-series wire family
# (interaction-store/pkg/proto/time_series.proto:16-34 — PersistClickData-
# Request{user_id=1, data=2 repeated ClickData} and PersistOrderDataRequest
# {user_id=1, data=2 repeated OrderData}; flat scalar messages, so a small
# field-spec table drives both directions)
# ---------------------------------------------------------------------------

CLICK_DATA_FIELDS: dict[int, tuple[str, str]] = {
    1: ("catalog_id", "int32"),
    2: ("product_id", "int32"),
    3: ("timestamp", "int64"),
    4: ("metadata", "string"),
}
ORDER_DATA_FIELDS: dict[int, tuple[str, str]] = {
    1: ("catalog_id", "int32"),
    2: ("product_id", "int32"),
    3: ("sub_order_num", "string"),
    4: ("timestamp", "int64"),
    5: ("metadata", "string"),
}
EVENT_FIELD_SPECS = {"click": CLICK_DATA_FIELDS, "order": ORDER_DATA_FIELDS}


def _encode_flat(msg: dict, fields: dict[int, tuple[str, str]]) -> bytes:
    """Encode a flat message of int32/int64/string fields (proto3 defaults
    omitted: zero ints and empty strings write no bytes)."""
    out = bytearray()
    for field, (name, kind) in fields.items():
        val = msg.get(name)
        if kind == "string":
            if val:
                out += _enc_len(field, str(val).encode("utf-8"))
        else:
            if val:
                out += _tag(field, _WT_VARINT) + _enc_varint(int(val))
    return bytes(out)


def _decode_flat(buf: bytes, fields: dict[int, tuple[str, str]]) -> dict:
    # proto3 scalar defaults for absent fields
    msg = {n: ("" if k == "string" else 0) for n, k in fields.values()}
    pos = 0
    while pos < len(buf):
        key, pos = _dec_varint(buf, pos)
        field, wt = key >> 3, key & 7
        spec = fields.get(field)
        if spec is None:  # unknown field: skip per proto3 rules
            if wt == _WT_VARINT:
                _, pos = _dec_varint(buf, pos)
            elif wt == _WT_LEN:
                ln, pos = _dec_varint(buf, pos)
                pos += ln
            elif wt == _WT_FIXED64:
                pos += 8
            elif wt == _WT_FIXED32:
                pos += 4
            else:
                raise ValueError(f"bad wiretype {wt}")
            continue
        name, kind = spec
        if kind == "string":
            if wt != _WT_LEN:
                raise ValueError(f"bad wiretype {wt} for string field {field}")
            ln, pos = _dec_varint(buf, pos)
            msg[name] = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        else:
            if wt != _WT_VARINT:
                raise ValueError(f"bad wiretype {wt} for int field {field}")
            n, pos = _dec_varint(buf, pos)
            msg[name] = _signed(n, 64)
    return msg


def encode_event_request(user_id: str, rows: list[dict], kind: str) -> bytes:
    """PersistClickDataRequest / PersistOrderDataRequest."""
    fields = EVENT_FIELD_SPECS[kind]
    out = bytearray()
    if user_id:
        out += _enc_len(1, str(user_id).encode("utf-8"))
    for row in rows:
        out += _enc_len(2, _encode_flat(row, fields))
    return bytes(out)


def decode_event_request(buf: bytes, kind: str) -> dict:
    """-> {"user_id": str, "data": [row dicts]}"""
    fields = EVENT_FIELD_SPECS[kind]
    req: dict = {"user_id": "", "data": []}
    pos = 0
    while pos < len(buf):
        key, pos = _dec_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt != _WT_LEN:
            raise ValueError(f"unexpected wiretype {wt} in request")
        ln, pos = _dec_varint(buf, pos)
        payload = buf[pos : pos + ln]
        pos += ln
        if field == 1:
            req["user_id"] = payload.decode("utf-8")
        elif field == 2:
            req["data"].append(_decode_flat(payload, fields))
        else:
            raise ValueError(f"unknown request field {field}")
    return req
