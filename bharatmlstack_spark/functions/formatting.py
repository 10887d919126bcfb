"""Go-parity float stringification (F13).

The reference's RetrieveDecodedResult stringifies every decoded value with
``fmt.Sprintf("%v", value)`` (features.go:112) — for floats that is
``strconv.FormatFloat(f, 'g', -1, 32/64)``: the SHORTEST decimal string
that round-trips to the same float, rendered positionally when the decimal
exponent is in [-4, 6) and as ``d.ddde±XX`` (two-digit exponent) otherwise
(the shortest-precision 'g' rule, strconv/ftoa.go).

numpy's ``format_float_scientific(unique=True)`` supplies the shortest
digit string for the value's own width (float32 digits for float32 input —
the crucial difference from Python's float64 ``repr``); the Go 'g'
placement rules are applied on top. Pinned against hand-derived Go vectors
in tests/test_formatting.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def go_format_float(v, bits: int = 32) -> str:
    """Go ``%v`` of one float32/float64 value."""
    v = np.float32(v) if bits == 32 else np.float64(v)
    if np.isnan(v):
        return "NaN"
    if np.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0:
        return "-0" if np.signbit(v) else "0"
    s = np.format_float_scientific(v, unique=True, trim="-")
    m, e = s.split("e")
    exp = int(e)
    neg = m.startswith("-")
    digits = m.lstrip("-").replace(".", "")
    if -4 <= exp < 6:  # shortest-'g' positional window (ftoa.go eprec=6)
        if exp >= len(digits) - 1:
            body = digits + "0" * (exp - len(digits) + 1)
        elif exp >= 0:
            body = digits[: exp + 1] + "." + digits[exp + 1 :]
        else:
            body = "0." + "0" * (-exp - 1) + digits
    else:
        mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        body = f"{mant}e{'+' if exp >= 0 else '-'}{abs(exp):02d}"
    return ("-" if neg else "") + body


def _scalar_fmt_udf(bits: int):
    @pandas_udf(T.StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else go_format_float(v, bits))

    return f


def _vector_fmt_udf(bits: int):
    @pandas_udf(T.StringType())
    def f(s: pd.Series) -> pd.Series:
        # joined ':' per HelperVectorFeature*ToConcatenatedString
        # (deserialized_psdb_v2.go:348-513)
        return s.map(
            lambda vec: None
            if vec is None
            else ":".join(go_format_float(v, bits) for v in vec)
        )

    return f


_GO_FMT_32 = _scalar_fmt_udf(32)
_GO_FMT_64 = _scalar_fmt_udf(64)
_GO_FMT_VEC_32 = _vector_fmt_udf(32)
_GO_FMT_VEC_64 = _vector_fmt_udf(64)


def go_format_float32(col: Column) -> Column:
    return _GO_FMT_32(col)


def go_format_float64(col: Column) -> Column:
    return _GO_FMT_64(col)


def go_format_float32_vec(col: Column) -> Column:
    """array<float> -> 'v1:v2:...' with Go element formatting."""
    return _GO_FMT_VEC_32(col)


def go_format_float64_vec(col: Column) -> Column:
    return _GO_FMT_VEC_64(col)
