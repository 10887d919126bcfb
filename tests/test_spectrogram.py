"""Spectrogram features (operators/multimodal.spectrogram_features):
numpy-STFT parity for the band energies, Parseval conservation, framing
edge cases, and the STAGED driver comparison for the pinned
``multimodal_spectrogram`` row (graduates via the
multimodal_decode_stats retirement, queries.py second-generation
list)."""

import duckdb
import numpy as np
import pytest

from bharatmlstack_spark.operators.multimodal import (
    encode_wav_pcm16,
    spectrogram_features,
    synthetic_real_media,
)

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    "meta struct<mime string, width int, height int, "
    "sample_rate int, duration_ms bigint>"
)


def _wav_row(spark, media_id, samples, rate=8000):
    content = encode_wav_pcm16(np.asarray(samples, dtype=np.int16), rate)
    meta = ("audio/wav", None, None, rate, len(samples) * 1000 // rate)
    return spark.createDataFrame(
        [(media_id, "audio", content, meta)], MEDIA_SCHEMA
    )


def _numpy_reference(samples, frame_len=64, n_bands=4):
    x = np.asarray(samples, dtype=np.float64)
    n_frames = len(x) // frame_len
    framed = x[: n_frames * frame_len].reshape(n_frames, frame_len)
    spec = np.fft.rfft(framed, axis=1)
    power = (np.abs(spec) ** 2) / frame_len
    w = np.full(power.shape[1], 2.0)
    w[0] = 1.0
    if frame_len % 2 == 0:
        w[-1] = 1.0
    weighted = power * w[None, :]
    edges = np.linspace(0, weighted.shape[1], n_bands + 1).astype(int)
    return [
        float(weighted[:, edges[b] : edges[b + 1]].sum())
        for b in range(n_bands)
    ]


def test_band_energies_match_direct_numpy_stft(spark):
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=300, dtype=np.int64)
    row = spectrogram_features(
        _wav_row(spark, 1, samples), frame_len=64, n_bands=4
    ).head()
    want = _numpy_reference(samples)
    assert row.n_frames == 4  # 300 // 64, tail dropped
    assert row.band_energy == pytest.approx(want, rel=1e-12)
    assert row.parseval_ok


def test_parseval_exact_energy_conservation(spark):
    """Σ band_energy == Σ x[n]² over the framed samples — a pure sine
    (energy concentrated in one band) and white noise both conserve."""
    t = np.arange(256)
    sine = (10000 * np.sin(2 * np.pi * 8 * t / 64)).astype(np.int64)
    row = spectrogram_features(_wav_row(spark, 2, sine)).head()
    assert row.parseval_ok
    assert sum(row.band_energy) == pytest.approx(
        float(row.frame_energy), rel=1e-9
    )
    # bin 8 of 33 lands in band 1 (edges [0,8,16,24,33)) — the sine's
    # energy concentrates there (spectral leakage is zero at an exact
    # bin frequency)
    assert row.band_energy[1] > 0.99 * sum(row.band_energy)


def test_frame_energy_is_exact_int(spark):
    samples = np.array([100, -200, 300, -400] * 32, dtype=np.int64)  # 128
    row = spectrogram_features(_wav_row(spark, 3, samples)).head()
    assert row.frame_energy == int((samples * samples).sum())
    assert row.n_frames == 2


def test_short_clip_yields_zero_frames(spark):
    row = spectrogram_features(_wav_row(spark, 4, [5] * 63)).head()
    assert row.n_frames == 0 and row.frame_energy == 0
    assert row.parseval_ok  # 0 == 0 conserves
    assert row.band_energy == [0.0, 0.0, 0.0, 0.0]


def test_odd_frame_len_nyquist_weighting(spark):
    """frame_len=63 has no Nyquist bin — every interior bin doubles;
    Parseval must still conserve (the even/odd weight branch)."""
    rng = np.random.default_rng(11)
    samples = rng.integers(-1000, 1000, size=189, dtype=np.int64)
    row = spectrogram_features(
        _wav_row(spark, 5, samples), frame_len=63, n_bands=3
    ).head()
    assert row.n_frames == 3
    assert row.parseval_ok


def test_multimodal_spectrogram_matches_duckdb_oracle(spark):
    """The driver's exact comparison on the STAGED (query, oracle) pair:
    exact int64 frame energies + the Parseval flag, over the closed-form
    audio fixture."""
    from bharatmlstack_spark.queries_text import (
        STAGED_ORACLES,
        multimodal_spectrogram,
    )

    out = multimodal_spectrogram(spark, "unused")
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    assert len(got) == 24  # the 24 audio rows of synthetic_real_media(48)

    con = duckdb.connect()
    rel = con.sql(STAGED_ORACLES["multimodal_spectrogram"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref


def test_spectrogram_skips_non_audio(spark):
    media = synthetic_real_media(spark, n=8)  # 4 images + 4 audio
    out = spectrogram_features(media)
    assert out.count() == 4
