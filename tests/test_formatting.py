"""Go %v float formatting parity (F13, features.go:112 ->
strconv.FormatFloat(f,'g',-1,32/64))."""

import numpy as np
import pytest

from bharatmlstack_spark.functions.formatting import go_format_float


@pytest.mark.parametrize(
    "val,expected",
    [
        (1.1, "1.1"),
        (1234.56, "1234.56"),
        (1e6, "1e+06"),  # 'g' switches to exponent form at 1e6 (eprec=6)
        (1234567.0, "1.234567e+06"),
        (999999.0, "999999"),
        (6.1e-5, "6.1e-05"),
        (0.00012345, "0.00012345"),  # exp=-4 stays positional
        (25.0, "25"),
        (-0.5, "-0.5"),
        (448.0, "448"),
        (0.1, "0.1"),
        (float("nan"), "NaN"),
        (float("inf"), "+Inf"),
        (float("-inf"), "-Inf"),
    ],
)
def test_go_format_float32_vectors(val, expected):
    assert go_format_float(val, 32) == expected


def test_go_format_signed_zero():
    assert go_format_float(np.float32(0.0), 32) == "0"
    assert go_format_float(np.float32(-0.0), 32) == "-0"


def test_go_format_width_matters():
    # float32 shortest digits differ from float64's for the same decimal:
    # 0.1 as float64 needs "0.1"; float32(0.1) promoted to float64 would be
    # "0.10000000149011612" — formatting at width 32 must give "0.1"
    v32 = np.float32(0.1)
    assert go_format_float(v32, 32) == "0.1"
    assert go_format_float(float(v32), 64) == "0.10000000149011612"


def test_money_domain_matches_decimal_trim():
    """The oracle's DECIMAL(18,2)+trim form == Go %v of float32(k/100),
    exhaustively over the fixture's account-balance domain."""
    for k in range(-99999, 1000000, 7):  # stride keeps runtime sane; plus edges
        _check_2dec(k)
    for k in (-99999, -1, 0, 1, 999999, 100, 1050, 999998):
        _check_2dec(k)


def _check_2dec(k: int):
    s = f"{k / 100:.2f}".rstrip("0").rstrip(".")
    if k == 0:
        s = "0"
    assert go_format_float(np.float32(k / 100.0), 32) == s, k


def test_taste_domain_matches_decimal_trim():
    for k in range(1000):
        s = f"{k / 1000:.3f}".rstrip("0").rstrip(".")
        if k == 0:
            s = "0"
        assert go_format_float(np.float32(k / 1000.0), 32) == s, k


# ---------------------------------------------------------------------------
# round-trip + shortest-ness properties over random floats (pure Python)
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bharatmlstack_spark.functions.formatting import go_format_float


@settings(max_examples=300, deadline=None)
@given(st.floats(width=32, allow_nan=False, allow_infinity=False))
def test_go_format_float32_roundtrips(v):
    """Go 'g'/-1 semantics: the string must parse back to the EXACT same
    float32 (shortest round-trip), and dropping its last digit must NOT
    (i.e. it really is minimal), for every finite float32."""
    s = go_format_float(v, bits=32)
    assert np.float32(float(s)) == np.float32(v) or (
        np.float32(v) == 0 and s in ("0", "-0")
    )
    # strip one significant digit and require the round-trip to break
    # (skip single-digit mantissas — nothing left to drop)
    digits = "".join(c for c in s.split("e")[0] if c.isdigit())
    if len(digits) > 1 and np.float32(v) != 0:
        if "e" in s:
            m, e = s.split("e")
            shorter = m[:-1].rstrip(".") + "e" + e
        else:
            shorter = s[:-1].rstrip(".")
        try:
            ok = np.float32(float(shorter)) != np.float32(v)
        except ValueError:
            ok = True  # truncation produced an unparseable string
        assert ok, (v, s, shorter)


@settings(max_examples=300, deadline=None)
@given(st.floats(width=64, allow_nan=False, allow_infinity=False))
def test_go_format_float64_roundtrips(v):
    s = go_format_float(v, bits=64)
    assert float(s) == v or (v == 0 and s in ("0", "-0"))
