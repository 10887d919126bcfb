"""Real pure-numpy media codecs: netpbm P5/P6 images and RIFF/WAVE PCM16.

The reference ingests real binary payloads per record
(skye/internal/consumers/handler/indexer/); here the decode runs inside
the Arrow-batched mapInPandas slot. These tests pin the codec laws the
driver-row oracles rely on: exact round-trips, spec-compliant header
parsing, floor-index resampling, and loud failure for formats that need
absent libraries.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bharatmlstack_spark.operators.multimodal import (
    decode_pnm,
    decode_stats,
    decode_wav_pcm16,
    encode_pnm,
    encode_wav_pcm16,
    extract_features,
    resize_nearest,
    synthetic_real_media,
)


# -- netpbm -----------------------------------------------------------------


def test_pnm_p5_roundtrip():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(decode_pnm(encode_pnm(g)), g)


def test_pnm_p6_roundtrip():
    c = (np.arange(6 * 8 * 3) % 256).astype(np.uint8).reshape(6, 8, 3)
    out = decode_pnm(encode_pnm(c))
    assert out.shape == (6, 8, 3)
    assert np.array_equal(out, c)


def test_pnm_header_comments_and_whitespace():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    data = b"P5 # trailing comment\n# full line\n 8\t6 \n255\n" + g.tobytes()
    assert np.array_equal(decode_pnm(data), g)


def test_pnm_16bit_rejected():
    data = b"P5\n2 2\n65535\n" + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_pnm(data)


def test_pnm_foreign_magic_raises_not_implemented():
    # JPEG SOI marker: decodable only with PIL/cv2, absent here
    with pytest.raises(NotImplementedError):
        decode_pnm(b"\xff\xd8\xff\xe0JFIF")


def test_pnm_garbage_header_raises_value_error():
    with pytest.raises(ValueError):
        decode_pnm(b"P5\nx y\n255\n")


def test_encode_pnm_rejects_bad_shape():
    with pytest.raises(ValueError):
        encode_pnm(np.zeros((2, 2, 4), dtype=np.uint8))


# -- resize -----------------------------------------------------------------


def test_resize_nearest_floor_index_law():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    out = resize_nearest(g, width=4, height=3)
    assert out.shape == (3, 4)
    for y in range(3):
        for x in range(4):
            assert out[y, x] == g[(y * 6) // 3, (x * 8) // 4]


def test_resize_nearest_upscale_and_identity():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(resize_nearest(g, 4, 3), g)
    up = resize_nearest(g, 8, 6)
    assert up.shape == (6, 8)
    # each source pixel appears as a 2x2 block
    assert np.array_equal(up[::2, ::2], g)
    assert np.array_equal(up[1::2, 1::2], g)


def test_resize_nearest_rgb():
    c = (np.arange(6 * 8 * 3) % 256).astype(np.uint8).reshape(6, 8, 3)
    out = resize_nearest(c, 4, 2)
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out[0, 0], c[0, 0])


# -- WAV --------------------------------------------------------------------


def test_wav_roundtrip():
    s = ((np.arange(333) * 104729) % 65536 - 32768).astype(np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 16000))
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_extra_chunk_before_data():
    # fmt may be followed by LIST/fact chunks; decoder must walk past them,
    # including odd-size word-alignment padding
    s = np.arange(100, dtype=np.int16)
    raw = encode_wav_pcm16(s, 8000)
    fmt_chunk, data_chunk = raw[12:36], raw[36:]
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    body = fmt_chunk + lst + data_chunk
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav_pcm16(wav)
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_stereo_rejected():
    s = np.zeros(10, dtype=np.int16)
    raw = bytearray(encode_wav_pcm16(s, 8000))
    raw[22:24] = struct.pack("<H", 2)  # n_channels = 2
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(bytes(raw))


def test_wav_foreign_magic_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)


def test_wav_missing_data_chunk():
    raw = encode_wav_pcm16(np.zeros(4, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav_pcm16(raw[:36])  # RIFF + fmt only


# -- property fuzz: codec laws over arbitrary payloads ----------------------


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    rgb=st.booleans(),
    data=st.data(),
)
def test_pnm_roundtrip_law(w, h, rgb, data):
    n = w * h * (3 if rgb else 1)
    flat = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    arr = np.array(flat, dtype=np.uint8).reshape((h, w, 3) if rgb else (h, w))
    assert np.array_equal(decode_pnm(encode_pnm(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(1, 192000),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
)
def test_wav_roundtrip_law(rate, samples):
    s = np.array(samples, dtype=np.int16)
    out, got_rate = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert got_rate == rate
    assert np.array_equal(out, s)


@settings(max_examples=50, deadline=None)
@given(
    w_in=st.integers(1, 16),
    h_in=st.integers(1, 16),
    w_out=st.integers(1, 16),
    h_out=st.integers(1, 16),
)
def test_resize_floor_index_law_fuzz(w_in, h_in, w_out, h_out):
    arr = (np.arange(w_in * h_in) % 256).astype(np.uint8).reshape(h_in, w_in)
    out = resize_nearest(arr, w_out, h_out)
    assert out.shape == (h_out, w_out)
    for y in range(h_out):
        for x in range(w_out):
            assert out[y, x] == arr[(y * h_in) // h_out, (x * w_in) // w_out]


# -- strict-decode end to end through Spark ---------------------------------


def test_strict_extract_features_on_real_media(spark):
    media = synthetic_real_media(spark, n=8)
    rows = extract_features(media, dim=8, strict_decode=True).collect()
    assert len(rows) == 8
    for r in rows:
        norm = float(np.linalg.norm(r["feature"]))
        assert norm == pytest.approx(1.0, abs=1e-5)


def test_strict_decode_stats_matches_closed_form(spark):
    media = synthetic_real_media(spark, n=6)
    got = {r["media_id"]: r for r in decode_stats(media, strict_decode=True).collect()}
    for i in range(6):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 6
            vals = (i * 31 + np.arange(w * h)) % 256
        else:
            n = 120 + (i % 7) * 40
            vals = (i * 7919 + np.arange(n) * 104729) % 65536 - 32768
        r = got[i]
        assert r["n_values"] == vals.size
        assert r["v_sum"] == int(vals.sum())
        assert r["v_min"] == int(vals.min())
        assert r["v_max"] == int(vals.max())


def test_decode_stats_nonstrict_uses_raw_bytes(spark):
    media = synthetic_real_media(spark, n=4)
    raw = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    got = {r["media_id"]: r for r in decode_stats(media).collect()}
    for mid, data in raw.items():
        b = np.frombuffer(data, dtype=np.uint8)
        assert got[mid]["n_values"] == len(data)
        assert got[mid]["v_sum"] == int(b.sum())


# -- PNG --------------------------------------------------------------------

from bharatmlstack_spark.operators.multimodal import (  # noqa: E402
    PNG_SIG,
    decode_image,
    decode_png,
    encode_png,
    synthetic_png_media,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    rgb=st.booleans(),
    filt=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_fuzz(w, h, rgb, filt, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(a, filt))
    assert out.shape == a.shape
    assert np.array_equal(out, a)


def test_png_filters_are_distinct_but_equivalent():
    """Every filter produces DIFFERENT on-disk bytes (so the fuzz above
    actually exercises five codepaths) yet identical pixels."""
    a = (np.arange(9 * 7) % 256).astype(np.uint8).reshape(9, 7)
    encoded = [encode_png(a, f) for f in range(5)]
    assert len({e for e in encoded}) == 5
    for e in encoded:
        assert np.array_equal(decode_png(e), a)


def test_png_multi_idat_chunks():
    """The spec allows IDAT split across chunks; decoders must concatenate."""
    from bharatmlstack_spark.operators.multimodal import _png_chunk

    a = (np.arange(5 * 4) % 256).astype(np.uint8).reshape(4, 5)
    whole = encode_png(a, 0)
    # re-split the single IDAT into two chunks
    pos = 8
    parts = {}
    while pos + 8 <= len(whole):
        (size,) = struct.unpack(">I", whole[pos : pos + 4])
        ctype = whole[pos + 4 : pos + 8]
        parts[ctype] = whole[pos + 8 : pos + 8 + size]
        pos += 12 + size
    idat = parts[b"IDAT"]
    split = (
        PNG_SIG
        + _png_chunk(b"IHDR", parts[b"IHDR"])
        + _png_chunk(b"IDAT", idat[: len(idat) // 2])
        + _png_chunk(b"IDAT", idat[len(idat) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(split), a)


def test_png_crc_corruption_raises():
    a = np.zeros((3, 3), dtype=np.uint8)
    data = bytearray(encode_png(a, 0))
    data[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_unsupported_features_raise():
    import zlib

    from bharatmlstack_spark.operators.multimodal import _png_chunk

    # palette color type (3)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_decode_image_dispatches_all_real_formats():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    from bharatmlstack_spark.operators.multimodal import encode_pnm

    assert np.array_equal(decode_image(encode_pnm(g)), g)
    assert np.array_equal(decode_image(encode_png(g)), g)


def test_synthetic_png_media_closed_form(spark):
    """The fixture's decoded pixels match the closed form the oracle uses."""
    rows = synthetic_png_media(spark, n=6).collect()
    for r in rows:
        arr = decode_png(bytes(r.content))
        i = r.media_id
        if i % 2 == 0:
            w, h = 5 + (i % 6), 4 + (i % 5)
            want = ((i * 37 + np.arange(w * h)) % 256).reshape(h, w)
        else:
            w, h = 4 + (i % 5), 3 + (i % 4)
            want = ((i * 53 + np.arange(w * h * 3)) % 256).reshape(h, w, 3)
        assert np.array_equal(arr, want)
