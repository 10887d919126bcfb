"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch iteration (mapInPandas), Arrow batch shapes, deterministic fallback
features. Codecs come in two tiers:

- REAL (pure numpy/stdlib, no external libs): PPM/PGM images (netpbm
  P6/P5 binary), PNG (8-bit gray/RGB, all five scanline filters, zlib
  inflate) and WAV/PCM16 audio decode, nearest-neighbor image resample,
  re-encode. `strict_decode=True` routes through these and raises only
  for formats that genuinely need an absent lib (JPEG/ffmpeg video).
- FAKE (deterministic stand-in derived from raw bytes): the default
  non-strict path, used where payloads are opaque/opaque-mime fixtures.

Swap `_decode_image_real` / `_decode_audio_real` internals for PIL/ffmpeg
on a codec-equipped cluster; schema, partitioning and batch shapes do not
change. Reference anchor: skye ingests real embedding payloads per record
(skye/internal/consumers/handler/indexer/); here the decode happens inside
the same Arrow-batched mapInPandas slot.

Schema convention:
    media_id   BIGINT
    modality   STRING ('image' | 'audio' | 'video')
    content    BINARY              -- opaque payload
    meta       STRUCT<mime STRING, width INT, height INT,
                      sample_rate INT, duration_ms BIGINT>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


# --------------------------------------------------------------------------
# Real pure-numpy codecs: netpbm P5 (PGM, grayscale) / P6 (PPM, RGB) binary
# images and RIFF/WAVE PCM16 mono audio. These are the simplest widely-used
# container formats whose decode needs nothing beyond numpy.
# --------------------------------------------------------------------------


def encode_pnm(arr: np.ndarray) -> bytes:
    """Encode uint8 pixels as binary netpbm: (h, w) -> P5, (h, w, 3) -> P6."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary netpbm P5/P6 -> uint8 array (h, w) or (h, w, 3).

    Handles arbitrary whitespace and '#' comments in the header, per the
    netpbm spec; maxval must be <=255 (8-bit)."""
    if data[:2] not in (b"P5", b"P6"):
        raise NotImplementedError(
            "image decode beyond PPM/PGM requires PIL/cv2; not available "
            "in this environment"
        )
    channels = 3 if data[:2] == b"P6" else 1
    # header = magic + 3 ASCII ints (w, h, maxval) separated by whitespace,
    # with optional '#' comments; pixel bytes start right after the single
    # whitespace byte that follows maxval
    pos, fields = 2, []
    while len(fields) < 3:
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            pos = data.index(b"\n", pos) + 1
        elif c.isdigit():
            end = pos
            while data[end : end + 1].isdigit():
                end += 1
            fields.append(int(data[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad netpbm header byte {c!r} at {pos}")
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    pos += 1  # exactly one whitespace byte after maxval
    n = w * h * channels
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape((h, w, 3) if channels == 3 else (h, w))


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample: out[y, x] = in[y*h_in//h_out, x*w_in//w_out].

    Floor-index mapping (not center-aligned) so an integer oracle can
    recompute any output pixel arithmetically."""
    h_in, w_in = arr.shape[:2]
    ys = (np.arange(height) * h_in) // height
    xs = (np.arange(width) * w_in) // width
    return arr[np.ix_(ys, xs)]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a canonical 44-byte-header RIFF/WAVE."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate).

    Walks the chunk list (fmt may be followed by LIST/fact before data)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio decode beyond WAV/PCM requires ffmpeg/torchaudio; not "
            "available in this environment"
        )
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt_tag, n_ch, bits) != (1, 1, 16):
                raise NotImplementedError(
                    f"only PCM16 mono supported, got tag={fmt_tag} ch={n_ch} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4): pick whichever of
    left(a)/up(b)/upleft(c) is closest to a+b-c, ties a > b > c."""
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(arr: np.ndarray, filters: int | str = "cycle") -> bytes:
    """Encode uint8 pixels as PNG: (h, w) -> grayscale, (h, w, 3) -> RGB.

    ``filters`` is a fixed scanline filter 0-4 or "cycle" (filter y % 5 on
    scanline y — every unfilter path gets exercised in one image). Filtering
    is fully vectorized: the predictors read RECONSTRUCTED neighbors, all
    known at encode time."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        h, w = a.shape
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
        h, w = a.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    raw = a.reshape(h, w * ch).astype(np.int16)
    zeros_row = np.zeros(w * ch, dtype=np.int16)
    body = bytearray()
    for y in range(h):
        f = (y % 5) if filters == "cycle" else int(filters)
        line = raw[y]
        prev = raw[y - 1] if y else zeros_row
        left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - (left + prev) // 2
        elif f == 4:
            filt = line - _paeth_predict(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter {f}")
        body.append(f)
        body.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit grayscale/RGB non-interlaced PNG -> uint8 array.

    Pure stdlib (zlib inflate, struct) + numpy filter reconstruction for
    all five scanline filters (None/Sub/Up/Average/Paeth). Sub uses a
    per-channel cumsum (mod-256 addition is associative); Average and
    Paeth carry a true sequential left-dependency, so those scanlines
    reconstruct in a per-byte loop — fine for a correctness path. CRCs
    are verified. Palette / 16-bit / interlaced PNGs raise."""
    import struct
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, dims = 8, bytearray(), None
    while pos + 8 <= len(data):
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack(">I", data[pos + 8 + size : pos + 12 + size])
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2) or comp or filt or interlace:
                raise NotImplementedError(
                    f"only 8-bit gray/RGB non-interlaced PNG supported "
                    f"(depth={depth} color={color} interlace={interlace})"
                )
            dims = (w, h, 1 if color == 0 else 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if dims is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = dims
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            recon = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-ch]
            recon = line.copy()
            for c in range(ch):
                recon[c::ch] = np.cumsum(line[c::ch]) % 256
        elif f == 2:  # Up
            recon = line + prev
        elif f == 3:  # Average: floor((left, up) mean) — left is sequential
            recon = np.empty(stride, np.int32)
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — left is sequential
            recon = np.empty(stride, np.int32)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                p = a + prev[x] - c
                pa, pb, pc = abs(p - a), abs(p - prev[x]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (prev[x] if pb <= pc else c)
                recon[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {f} on scanline {y}")
        out[y] = recon % 256
    return out.reshape((h, w, 3) if ch == 3 else (h, w))


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes: netpbm P5/P6 or PNG (both pure numpy).
    Everything else (JPEG, video frames) genuinely needs PIL/ffmpeg,
    absent from this runtime, and raises NotImplementedError."""
    data = bytes(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data[:8] == PNG_SIG:
        return decode_png(data)
    raise NotImplementedError(
        "image decode beyond PGM/PPM/PNG requires PIL/cv2; not available "
        "in this environment"
    )


def _decode_image_real(content: bytes, meta) -> np.ndarray:
    """Real image decoder: pure-numpy netpbm (P5/P6) or PNG (8-bit
    gray/RGB). Other formats raise NotImplementedError — JPEG needs
    PIL/cv2, absent from this runtime."""
    return decode_image(content)


def _decode_audio_real(content: bytes, meta) -> tuple[np.ndarray, int]:
    """Real audio decoder: pure-numpy RIFF/WAVE PCM16. Other formats raise
    NotImplementedError."""
    return decode_wav_pcm16(bytes(content))


def _hist_feature(values: np.ndarray, dim: int) -> np.ndarray:
    """L2-normalized ``values % dim`` histogram (float64 accumulate, float32
    out) — the shared feature form for raw bytes and decoded pixel/sample
    arrays. Python floor-mod keeps negative samples in [0, dim)."""
    if values.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(
        values.astype(np.int64) % dim, minlength=dim
    ).astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram folded to `dim`
    buckets, L2-normalized. Fully reproducible across runs/engines."""
    return _hist_feature(np.frombuffer(content, dtype=np.uint8), dim)


def _decode_values(modality: str, content: bytes, meta) -> np.ndarray:
    """Real-codec decode to a flat int array: pixels for images, samples
    for audio. Raises NotImplementedError for undecodable formats/video."""
    if modality == "image":
        return _decode_image_real(content, meta).ravel()
    if modality == "audio":
        return _decode_audio_real(content, meta)[0]
    raise NotImplementedError(f"no real codec for modality {modality!r}")


def extract_features(
    media: DataFrame, dim: int = 8, strict_decode: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow-batched: each partition streams pandas batches; per batch one
    vectorized pass. ``strict_decode=True`` routes through the REAL codecs
    (netpbm pixels / WAV samples feed the histogram; unsupported formats
    raise); the default computes the deterministic raw-byte stand-in.
    """

    # local aliases for the batch loop; NOTE these still pickle by
    # REFERENCE (cloudpickle serializes importable module-level functions
    # by name), so executors need this package importable — which
    # query_registry.ensure_workers_have_package guarantees via addPyFile
    fake_feature = _fake_feature
    hist_feature = _hist_feature
    decode_values = _decode_values

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for modality, content, meta in zip(
                pdf["modality"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                if strict_decode:
                    feats.append(
                        hist_feature(decode_values(modality, data, meta), dim)
                    )
                else:
                    feats.append(fake_feature(data, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


SPECTROGRAM_SCHEMA = (
    "media_id long, n_frames long, frame_energy long, "
    "band_energy array<double>, parseval_ok boolean"
)


def spectrogram_features(
    media: DataFrame, frame_len: int = 64, n_bands: int = 4
) -> DataFrame:
    """Spectral features over PCM16 audio through the REAL WAV codec:
    non-overlapping rectangular frames of ``frame_len`` samples, numpy
    rFFT per frame, |X|² pooled into ``n_bands`` equal bins-ranges and
    summed over frames — the mapInPandas shape of a production
    mel-spectrogram job (the mel filterbank swaps in for the equal-width
    pooling; the framing/FFT/pool plumbing is identical).

    Honest verification without an FFT in SQL: the output carries
    ``frame_energy`` = Σ x[n]² over the framed samples — EXACT int64
    arithmetic on the decoded int16s, so a SQL oracle recomputes it from
    the closed-form fixture — and ``parseval_ok``, which asserts the
    spectral side conserves it: with a rectangular window, hop ==
    frame_len, and rFFT weights (1 for DC/Nyquist, 2 for interior bins,
    all /N), Σ band_energy == frame_energy to float tolerance. A wrong
    frame split, a dropped bin, a mis-weighted Nyquist, or a decode
    off-by-one each break one of the two columns.

    Scale: map-side only (Arrow batches, one vectorized rFFT per batch
    row-group); at 100 TB the audio bytes stream through executors once,
    nothing shuffles until whatever aggregates the features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, te, bands, ok = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                samples, _rate = decode_wav_pcm16(data)
                n_frames = len(samples) // frame_len
                framed = (
                    samples[: n_frames * frame_len]
                    .astype(np.float64)
                    .reshape(n_frames, frame_len)
                )
                # exact integer energy over the framed samples (int16²
                # sums fit int64 comfortably: < 2^30 per sample)
                ints = samples[: n_frames * frame_len].astype(np.int64)
                frame_energy = int((ints * ints).sum())
                spec = np.fft.rfft(framed, axis=1)
                power = (spec.real**2 + spec.imag**2) / float(frame_len)
                # Parseval weights for even frame_len: interior bins
                # carry their conjugate twin
                w = np.full(power.shape[1], 2.0)
                w[0] = 1.0
                if frame_len % 2 == 0:
                    w[-1] = 1.0
                weighted = power * w[None, :]
                # equal-width band pooling over the n_bins rFFT bins
                n_bins = weighted.shape[1]
                edges = np.linspace(0, n_bins, n_bands + 1).astype(int)
                be = [
                    float(weighted[:, edges[b] : edges[b + 1]].sum())
                    for b in range(n_bands)
                ]
                spectral = float(sum(be))
                ids.append(mid)
                nfr.append(n_frames)
                te.append(frame_energy)
                bands.append(be)
                ok.append(
                    abs(spectral - frame_energy)
                    <= 1e-9 * max(float(frame_energy), 1.0)
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_frames": nfr,
                    "frame_energy": te,
                    "band_energy": bands,
                    "parseval_ok": ok,
                }
            )

    return media.filter(F.col("modality") == "audio").mapInPandas(
        run, schema=SPECTROGRAM_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame sampling STUB with real batch plumbing: slices the binary
    payload at fixed strides (a real impl would seek keyframes). Output is
    one row per sampled 'frame'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.filter(F.col("modality") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<mime string, width int, height int, "
    "sample_rate int, duration_ms bigint>"
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, strict_decode: bool = False
) -> DataFrame:
    """Image resize over the binary column, in one mapInPandas slot.

    ``strict_decode=True`` is the REAL path: netpbm decode -> nearest-
    neighbor resample on actual pixels -> netpbm re-encode (raises for
    formats needing absent libs). The default keeps the deterministic fake
    (payload tiled/truncated to the w*h byte budget) for opaque fixtures.
    Non-image rows pass through untouched."""
    decode_real = _decode_image_real
    resample = resize_nearest
    reencode = encode_pnm
    budget = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for modality, content, meta in zip(
                pdf["modality"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                meta = dict(meta) if meta is not None else {}
                if modality == "image":
                    if strict_decode:
                        pixels = decode_real(data, meta)
                        data = reencode(resample(pixels, width, height))
                    else:
                        # deterministic fake "resample": tile/truncate to budget
                        reps = -(-budget // max(len(data), 1)) if data else 1
                        data = (data * reps)[:budget] if data else b"\x00" * budget
                    meta["width"], meta["height"] = width, height
                contents.append(data)
                metas.append(meta)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": contents, "meta": metas}
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


DECODE_STATS_SCHEMA = (
    "media_id long, modality string, n_values long, "
    "v_sum long, v_min long, v_max long"
)


def decode_stats(media: DataFrame, strict_decode: bool = False) -> DataFrame:
    """Per-media statistics over DECODED values (pixels / samples), one
    mapInPandas slot.

    ``strict_decode=True`` runs the REAL codecs: netpbm pixels for images,
    PCM16 samples for audio (unsupported formats raise). The default
    computes the same stats over the raw payload bytes — the deterministic
    stand-in used for opaque fixtures. Mirrors the reference's per-payload
    handling at ingest (skye/internal/consumers/handler/indexer/) where
    each record's binary body is decoded inside the consumer worker."""
    decode_values = _decode_values

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_values, v_sum, v_min, v_max = [], [], [], []
            for modality, content, meta in zip(
                pdf["modality"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                if strict_decode:
                    vals = decode_values(modality, data, meta).astype(np.int64)
                else:
                    vals = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                n_values.append(vals.size)
                v_sum.append(int(vals.sum()) if vals.size else 0)
                v_min.append(int(vals.min()) if vals.size else 0)
                v_max.append(int(vals.max()) if vals.size else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_values": n_values,
                    "v_sum": v_sum,
                    "v_min": v_min,
                    "v_max": v_max,
                }
            )

    return media.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


def _media_frame(spark, rows) -> DataFrame:
    """Fixture frame with ~6 rows per task, EXACTLY sliced, capped at the
    core count. parallelize(rows, n_slices) slices exactly (ceil/floor
    rows per slice, no empties): the previous createDataFrame(...)
    .coalesce(n) only merged ADJACENT slices of the default
    defaultParallelism slicing, so a 24-row/32-slice frame could coalesce
    interleaved 0/1-row slices into 2-row and 0-row partitions — neither
    the claimed task layout nor "no empty slices" was guaranteed (ADVICE
    r16), and r16's rows-per-task A/B was run against that uneven
    packing (its "1 row/task is the warm optimum" conclusion does not
    survive exact slicing: measured warm medians at sf0.1,
    4-draw x 2 reps, 1 row/task 0.73-0.82 s, 4 rows 0.42-0.46,
    6 rows 0.39-0.40, 8 rows 0.38, 12 rows 0.36-0.39 — the per-task
    Arrow/worker round-trip dominates the trivial per-row decode, guide
    §4). 6 rows/task sits on the flat part of that curve while keeping
    >= 4 tasks of decode parallelism for the larger fixtures; the cold
    worker-spawn wave also shrinks from ~rows workers to ~rows/6. Real
    media at scale arrives from parquet with byte-sized splits; only the
    synthetic fixtures need this."""
    par = spark.sparkContext.defaultParallelism
    n_slices = max(1, min(par, -(-len(rows) // 6)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )


def synthetic_real_media(spark, n: int = 48) -> DataFrame:
    """Deterministic fixture of REAL decodable media: even ids are binary
    P5 (PGM) images, odd ids are RIFF/WAVE PCM16 audio. Pixels and samples
    are closed-form in (media_id, flat index), so a SQL oracle can
    recompute any decoded value arithmetically:

        image i:  w = 8 + (i%5)*4,  h = 6 + (i%3)*6,
                  pixel[k] = (i*31 + k) % 256          (k = y*w + x)
        audio i:  n = 120 + (i%7)*40, rate = 8000 + (i%3)*4000,
                  sample[k] = (i*7919 + k*104729) % 65536 - 32768
    """
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 6
            pixels = (i * 31 + np.arange(w * h)) % 256
            content = encode_pnm(pixels.astype(np.uint8).reshape(h, w))
            meta = ("image/x-portable-graymap", w, h, None, None)
            rows.append((i, "image", content, meta))
        else:
            n_samples = 120 + (i % 7) * 40
            rate = 8000 + (i % 3) * 4000
            samples = (i * 7919 + np.arange(n_samples) * 104729) % 65536 - 32768
            content = encode_wav_pcm16(samples.astype(np.int16), rate)
            meta = ("audio/wav", None, None, rate, n_samples * 1000 // rate)
            rows.append((i, "audio", content, meta))
    return _media_frame(spark, rows)


def synthetic_rgb_media(spark, n: int = 24) -> DataFrame:
    """Deterministic fixture of REAL color images: binary P6 (PPM) RGB,
    pixels closed-form in (media_id, flat byte index):

        image i:  w = 6 + (i%4)*2,  h = 4 + (i%5)*2,
                  byte[k] = (i*17 + k) % 256     (k = (y*w + x)*3 + c)
    """
    rows = []
    for i in range(n):
        w, h = 6 + (i % 4) * 2, 4 + (i % 5) * 2
        flat = (i * 17 + np.arange(w * h * 3)) % 256
        content = encode_pnm(flat.astype(np.uint8).reshape(h, w, 3))
        meta = ("image/x-portable-pixmap", w, h, None, None)
        rows.append((i, "image", content, meta))
    return _media_frame(spark, rows)


def synthetic_png_media(spark, n: int = 24) -> DataFrame:
    """Deterministic fixture of REAL PNG images (encoded with the filter
    CYCLE, so every scanline filter 0-4 appears): even ids grayscale, odd
    ids RGB, pixels closed-form in (media_id, flat index):

        gray i: w = 5 + (i%6), h = 4 + (i%5), pixel[k] = (i*37 + k) % 256
        rgb  i: w = 4 + (i%5), h = 3 + (i%4), byte[k]  = (i*53 + k) % 256
    """
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 5 + (i % 6), 4 + (i % 5)
            flat = (i * 37 + np.arange(w * h)) % 256
            content = encode_png(flat.astype(np.uint8).reshape(h, w))
        else:
            w, h = 4 + (i % 5), 3 + (i % 4)
            flat = (i * 53 + np.arange(w * h * 3)) % 256
            content = encode_png(flat.astype(np.uint8).reshape(h, w, 3))
        rows.append((i, "image", content, ("image/png", w, h, None, None)))
    return _media_frame(spark, rows)


def synthetic_media(spark, n: int = 16) -> DataFrame:
    """Deterministic fixture: binary payloads derived from the row id."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        content = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        meta = (
            "application/octet-stream",
            64 if modality == "image" else None,
            48 if modality == "image" else None,
            16000 if modality == "audio" else None,
            1000 * (i + 1) if modality == "video" else None,
        )
        rows.append((i, modality, content, meta))
    return _media_frame(spark, rows)
