"""Quantization round-trip functions: fp16, fp8-E5M2, fp8-E4M3.

The reference stores features at narrow float widths and serves
cast-on-read quantized projections (``feature@DataTypeFP16`` — ref:
online-feature-store/internal/handler/feature/retrieve.go:1071-1090,
internal/quantization/quantization_utils.go:19-226, custom float8 codecs at
pkg/float8/float8_e5m2.go and float8_e4m3.go).

Spark has no fp16/fp8 types, so the *semantics* — "the value you read is the
value that survives the narrow encoding" — are provided by round-trip
functions: encode to the narrow format, decode back to float32. The numpy
cores are vectorized bit manipulation (Arrow-batched via pandas_udf; never
row-at-a-time Python).

Format notes (public IEEE-754 / OCP FP8 layouts):
- fp16: 1s/5e/10m — numpy float16 is exactly this.
- E5M2: 1s/5e/2m — bit-truncation of fp16 with round-to-nearest-even;
  inherits fp16's inf/nan.
- E4M3: the FN variant (1s/4e/3m, bias 7, no infinities, max finite 448,
  all-ones = NaN), matching the reference codec
  (pkg/float8/float8_e4m3.go: overflow encodes 0x7F = NaN); implemented
  here via a codebook + round-to-nearest-even search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# numpy cores (pure, testable without Spark)
# --------------------------------------------------------------------------


def fp16_roundtrip_np(x: np.ndarray) -> np.ndarray:
    """float32/64 -> fp16 -> float32 (IEEE half, numpy-native)."""
    with np.errstate(over="ignore"):  # overflow -> fp16 inf is the intent
        return x.astype(np.float16).astype(np.float32)


def fp8e5m2_roundtrip_np(x: np.ndarray) -> np.ndarray:
    """float -> E5M2 -> float32.

    E5M2 is fp16 with the mantissa cut 10->2 bits, so encode = round-to-
    nearest-even on the low 8 bits of the fp16 bit pattern, decode = put the
    byte back in the high bits of an fp16.
    """
    with np.errstate(over="ignore"):  # overflow -> fp16 inf is the intent
        h = x.astype(np.float16)
    u = h.view(np.uint16)
    is_nan = np.isnan(h)
    # round-to-nearest-even at bit 8
    rounded = (u.astype(np.uint32) + 0x7F + ((u >> 8) & 1)).astype(np.uint32)
    # on mantissa overflow this carries into the exponent, which is the
    # correct behavior (rounds up to the next binade / to infinity)
    out = ((rounded >> 8) << 8).astype(np.uint16).view(np.float16)
    out = np.where(is_nan, np.float16(np.nan), out)
    return out.astype(np.float32)


def _e4m3fn_codebook() -> np.ndarray:
    """Non-negative E4M3FN values in (exp, mantissa) order, value-ascending.

    Index i <-> (exp = i//8, man = i%8), so index parity == mantissa parity
    (used for tie-to-even). The final slot (exp=15, man=7) is the NaN code;
    we keep its "virtual" value 480 as a sentinel — rounding onto it encodes
    NaN, exactly like the reference's overflow path (float8_e4m3.go: fBits >=
    1087<<20 -> 0x7F).
    """
    vals = []
    for exp in range(16):
        for man in range(8):
            if exp == 0:
                v = (man / 8.0) * 2.0**-6  # subnormal
            else:
                v = (1 + man / 8.0) * 2.0 ** (exp - 7)
            vals.append(v)
    return np.array(vals, dtype=np.float64)


_E4M3_POS = _e4m3fn_codebook()
_E4M3_NAN_IDX = len(_E4M3_POS) - 1  # virtual 480 slot == NaN code 0x7F
_E4M3_MAX = float(_E4M3_POS[-2])  # 448, largest finite


def fp8e4m3_roundtrip_np(x: np.ndarray) -> np.ndarray:
    """float -> E4M3FN -> float32 via codebook nearest-even search."""
    xf = np.asarray(x, dtype=np.float64)
    sign = np.signbit(xf)
    ax = np.abs(xf)
    nan = np.isnan(xf)
    idx = np.searchsorted(_E4M3_POS, ax, side="left").clip(0, _E4M3_NAN_IDX)
    lo_idx = np.maximum(idx - 1, 0)
    lo = _E4M3_POS[lo_idx]
    hi = _E4M3_POS[idx]
    dlo = ax - lo
    dhi = hi - ax
    take_lo = (dlo < dhi) | ((dlo == dhi) & (lo_idx % 2 == 0))
    near_idx = np.where(take_lo, lo_idx, idx)
    near = _E4M3_POS[near_idx]
    # overflow -> NaN (FN has no infinities): beyond the table, or rounded
    # onto the NaN slot
    to_nan = nan | (ax >= _E4M3_POS[-1]) | (near_idx == _E4M3_NAN_IDX)
    out = np.where(sign, -near, near)
    out = np.where(to_nan, np.nan, out)
    return out.astype(np.float32)


_NP_CORES = {
    "fp16": fp16_roundtrip_np,
    "fp8e5m2": fp8e5m2_roundtrip_np,
    "fp8e4m3": fp8e4m3_roundtrip_np,
}

# --------------------------------------------------------------------------
# Spark column functions (Arrow-batched pandas_udfs)
# --------------------------------------------------------------------------


def _scalar_udf(core):
    @pandas_udf(T.FloatType())
    def f(s: pd.Series) -> pd.Series:
        return pd.Series(core(s.to_numpy(dtype=np.float64)), index=s.index)

    return f


def _vector_udf(core):
    @pandas_udf(T.ArrayType(T.FloatType()))
    def f(s: pd.Series) -> pd.Series:
        # ragged list column: flatten -> one vectorized pass -> re-split
        lens = s.map(lambda v: 0 if v is None else len(v))
        flat = np.concatenate([np.asarray(v, dtype=np.float64) for v in s if v is not None]) \
            if int(lens.sum()) else np.array([], dtype=np.float64)
        q = core(flat)
        out, pos = [], 0
        for n, v in zip(lens, s):
            if v is None:
                out.append(None)
            else:
                out.append(q[pos : pos + n])
                pos += n
        return pd.Series(out, index=s.index)

    return f


_FP16 = _scalar_udf(fp16_roundtrip_np)
_FP8E5M2 = _scalar_udf(fp8e5m2_roundtrip_np)
_FP8E4M3 = _scalar_udf(fp8e4m3_roundtrip_np)
_FP16_V = _vector_udf(fp16_roundtrip_np)
_FP8E5M2_V = _vector_udf(fp8e5m2_roundtrip_np)
_FP8E4M3_V = _vector_udf(fp8e4m3_roundtrip_np)


def fp16_roundtrip(col: Column, vector: bool = False) -> Column:
    return (_FP16_V if vector else _FP16)(col)


def fp8e5m2_roundtrip(col: Column, vector: bool = False) -> Column:
    return (_FP8E5M2_V if vector else _FP8E5M2)(col)


def fp8e4m3_roundtrip(col: Column, vector: bool = False) -> Column:
    return (_FP8E4M3_V if vector else _FP8E4M3)(col)


def quantize_column(col: Column, target: "DataType", vector: bool = False) -> Column:
    """Cast-on-read projection to ``target`` (P2). Floats round-trip through
    the narrow format; integer targets are plain casts (the reference only
    permits equal-or-lower precision; callers check via
    ``check_quantization_compat``)."""
    from bharatmlstack_spark.registry import DataType

    elem = target.element
    if elem == DataType.FP16:
        return fp16_roundtrip(col, vector)
    if elem == DataType.FP8E5M2:
        return fp8e5m2_roundtrip(col, vector)
    if elem == DataType.FP8E4M3:
        return fp8e4m3_roundtrip(col, vector)
    spark_t = target.spark_type
    if vector and not target.is_vector:
        spark_t = T.ArrayType(spark_t, containsNull=False)
    return col.cast(spark_t)


def check_quantization_compat(source: "DataType", target: "DataType") -> None:
    """Precision-rank compatibility (quantization_utils.go:70-102): projection
    must not increase precision, must stay in-kind (float->float, int->int),
    and vector-ness must match."""
    if source.is_vector != target.is_vector:
        raise ValueError(f"cannot project {source.value} as {target.value}: vector mismatch")
    s, t = source.element, target.element
    float_kind = {"FP64", "FP32", "FP16", "FP8E5M2", "FP8E4M3"}
    s_float = s.name in float_kind
    t_float = t.name in float_kind
    if s_float != t_float or s.precision_rank == 0 or t.precision_rank == 0:
        raise ValueError(f"incompatible quantization {source.value} -> {target.value}")
    if t.precision_rank > s.precision_rank:
        raise ValueError(
            f"quantization may not widen: {source.value} (rank {s.precision_rank}) "
            f"-> {target.value} (rank {t.precision_rank})"
        )


# --------------------------------------------------------------------------
# narrow STORAGE codecs: fp16 -> int16 bits, fp8 -> int8 code
# (SURVEY.md §4: the one genuinely custom physical piece — parquet has no
# fp16/fp8, so narrow floats store as SMALLINT/TINYINT bit patterns at 2x/4x
# density vs FLOAT, with encode/decode functions at the boundary.)
# --------------------------------------------------------------------------


def fp16_encode_np(x: np.ndarray) -> np.ndarray:
    """float -> IEEE-half bit pattern as int16 (storage form)."""
    with np.errstate(over="ignore"):
        return np.asarray(x, dtype=np.float64).astype(np.float16).view(np.int16)


def fp16_decode_np(bits: np.ndarray) -> np.ndarray:
    return np.asarray(bits, dtype=np.int16).view(np.float16).astype(np.float32)


def fp8e5m2_encode_np(x: np.ndarray) -> np.ndarray:
    """float -> E5M2 code byte as int8 (storage form): round via the fp16
    truncation then keep the high byte."""
    with np.errstate(over="ignore"):
        h = np.asarray(x, dtype=np.float64).astype(np.float16)
    u = h.view(np.uint16)
    rounded = (u.astype(np.uint32) + 0x7F + ((u >> 8) & 1)).astype(np.uint32)
    code = (rounded >> 8).astype(np.uint8)
    code = np.where(np.isnan(h), np.uint8(0x7F), code)  # canonical NaN
    return code.view(np.int8)


def fp8e5m2_decode_np(code: np.ndarray) -> np.ndarray:
    u = code.astype(np.int8).view(np.uint8).astype(np.uint16) << 8
    return u.view(np.float16).astype(np.float32)


def fp8e4m3_encode_np(x: np.ndarray) -> np.ndarray:
    """float -> E4M3FN code byte as int8 (storage form): sign bit | 7-bit
    codebook index, nearest-even; overflow/NaN -> canonical 0x7F (matching
    the reference's float8_e4m3.go overflow path)."""
    xf = np.asarray(x, dtype=np.float64)
    sign = np.signbit(xf)
    ax = np.abs(xf)
    nan = np.isnan(xf)
    idx = np.searchsorted(_E4M3_POS, ax, side="left").clip(0, _E4M3_NAN_IDX)
    lo_idx = np.maximum(idx - 1, 0)
    lo = _E4M3_POS[lo_idx]
    hi = _E4M3_POS[idx]
    dlo = ax - lo
    dhi = hi - ax
    take_lo = (dlo < dhi) | ((dlo == dhi) & (lo_idx % 2 == 0))
    near_idx = np.where(take_lo, lo_idx, idx)
    to_nan = nan | (ax >= _E4M3_POS[-1]) | (near_idx == _E4M3_NAN_IDX)
    code = (near_idx.astype(np.uint8) | (sign.astype(np.uint8) << 7)).astype(np.uint8)
    code = np.where(to_nan, np.uint8(0x7F), code)
    return code.view(np.int8)


def fp8e4m3_decode_np(code: np.ndarray) -> np.ndarray:
    u = np.asarray(code, dtype=np.int8).view(np.uint8)
    idx = (u & 0x7F).astype(np.int64)
    v = _E4M3_POS[idx]
    out = np.where((u >> 7) == 1, -v, v)
    out = np.where(idx == _E4M3_NAN_IDX, np.nan, out)
    return out.astype(np.float32)




def _make_scalar_udf(core, out_type):
    @pandas_udf(out_type)
    def f(s: pd.Series) -> pd.Series:
        return pd.Series(core(s.to_numpy(dtype=np.float64)), index=s.index)

    return f


def _make_decode_udf(core, in_dtype):
    @pandas_udf(T.FloatType())
    def f(s: pd.Series) -> pd.Series:
        return pd.Series(core(s.to_numpy(dtype=in_dtype)), index=s.index)

    return f


def _make_vector_codec_udf(core, out_elem_type, in_np_dtype):
    """Ragged list column codec: flatten -> one vectorized core pass ->
    re-split (same shape as _vector_udf; Arrow-batched, never per-row)."""

    @pandas_udf(T.ArrayType(out_elem_type))
    def f(s: pd.Series) -> pd.Series:
        lens = s.map(lambda v: 0 if v is None else len(v))
        flat = (
            np.concatenate([np.asarray(v, dtype=in_np_dtype) for v in s if v is not None])
            if int(lens.sum())
            else np.array([], dtype=in_np_dtype)
        )
        q = core(flat)
        out, pos = [], 0
        for n, v in zip(lens, s):
            if v is None:
                out.append(None)
            else:
                out.append(q[pos : pos + n])
                pos += n
        return pd.Series(out, index=s.index)

    return f


_FP16_ENCODE = _make_scalar_udf(fp16_encode_np, T.ShortType())
_FP16_DECODE = _make_decode_udf(fp16_decode_np, np.int16)
_FP8E5M2_ENCODE = _make_scalar_udf(fp8e5m2_encode_np, T.ByteType())
_FP8E5M2_DECODE = _make_decode_udf(fp8e5m2_decode_np, np.int8)
_FP8E4M3_ENCODE = _make_scalar_udf(fp8e4m3_encode_np, T.ByteType())
_FP8E4M3_DECODE = _make_decode_udf(fp8e4m3_decode_np, np.int8)
_FP16_ENCODE_V = _make_vector_codec_udf(fp16_encode_np, T.ShortType(), np.float64)
_FP16_DECODE_V = _make_vector_codec_udf(fp16_decode_np, T.FloatType(), np.int16)
_FP8E5M2_ENCODE_V = _make_vector_codec_udf(fp8e5m2_encode_np, T.ByteType(), np.float64)
_FP8E5M2_DECODE_V = _make_vector_codec_udf(fp8e5m2_decode_np, T.FloatType(), np.int8)
_FP8E4M3_ENCODE_V = _make_vector_codec_udf(fp8e4m3_encode_np, T.ByteType(), np.float64)
_FP8E4M3_DECODE_V = _make_vector_codec_udf(fp8e4m3_decode_np, T.FloatType(), np.int8)


def fp16_encode(col: Column) -> Column:
    """Storage form: SMALLINT holding the IEEE-half bit pattern."""
    return _FP16_ENCODE(col)


def fp16_decode(col: Column) -> Column:
    return _FP16_DECODE(col)


def fp8e5m2_encode(col: Column) -> Column:
    """Storage form: TINYINT holding the E5M2 code."""
    return _FP8E5M2_ENCODE(col)


def fp8e5m2_decode(col: Column) -> Column:
    return _FP8E5M2_DECODE(col)


# storage codec dispatch by narrow element type name -> (encode, decode)
# in scalar and vector forms; consumed by FeatureStore's narrow-storage path
STORAGE_CODECS: dict[str, dict[str, tuple]] = {
    "FP16": {
        "scalar": (_FP16_ENCODE, _FP16_DECODE),
        "vector": (_FP16_ENCODE_V, _FP16_DECODE_V),
    },
    "FP8E5M2": {
        "scalar": (_FP8E5M2_ENCODE, _FP8E5M2_DECODE),
        "vector": (_FP8E5M2_ENCODE_V, _FP8E5M2_DECODE_V),
    },
    "FP8E4M3": {
        "scalar": (_FP8E4M3_ENCODE, _FP8E4M3_DECODE),
        "vector": (_FP8E4M3_ENCODE_V, _FP8E4M3_DECODE_V),
    },
}


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the round-trips to spark.sql as named functions."""
    spark.udf.register("fp16_roundtrip", _FP16)
    spark.udf.register("fp8e5m2_roundtrip", _FP8E5M2)
    spark.udf.register("fp8e4m3_roundtrip", _FP8E4M3)
    spark.udf.register("fp16_roundtrip_vec", _FP16_V)
    spark.udf.register("fp8e5m2_roundtrip_vec", _FP8E5M2_V)
    spark.udf.register("fp8e4m3_roundtrip_vec", _FP8E4M3_V)
    spark.udf.register("fp16_encode", _FP16_ENCODE)
    spark.udf.register("fp16_decode", _FP16_DECODE)
    spark.udf.register("fp8e5m2_encode", _FP8E5M2_ENCODE)
    spark.udf.register("fp8e5m2_decode", _FP8E5M2_DECODE)
