"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels. ``decode_image`` REALLY decodes PPM P6 and
24-bit BMP with numpy alone, 8-bit PNG with stdlib zlib + the PNG
scanline unfilter pass, and baseline sequential JPEG with a
numpy-only Huffman+IDCT pipeline (operators/jpeg_py.py); WebP and
progressive JPEG stay gated behind NotImplementedError because this
container ships no codec libraries — swapping that gate for
PIL/ffmpeg changes one function, the Spark-side plumbing (schema,
batching, partition-size discipline) is identical either way and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    REAL for binary netpbm ``P6`` (PPM), 24-bit uncompressed ``BI_RGB``
    BMP (bottom-up or top-down), 8/16-bit PNG (gray/RGB/palette/alpha
    color types, all five scanline filters, non-interlaced and Adam7 —
    stdlib zlib, no codec library; see :func:`_decode_png`), and
    baseline sequential JPEG
    (grayscale + YCbCr 4:4:4/4:2:2/4:2:0, restart markers — numpy
    Huffman+IDCT, :mod:`choetl_spark.operators.jpeg_py`). Progressive
    JPEG and WebP still need PIL/libjpeg — those raise
    NotImplementedError (the environmental gate; a deployment plugs
    PIL in right here)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp24(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from choetl_spark.operators.jpeg_py import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "only PPM(P6)/BMP(24-bit)/PNG(8-bit)/baseline-JPEG decode "
        "without codec libraries; WebP and progressive JPEG require "
        "PIL/libjpeg (not in this container)"
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm P6: ASCII header (with # comments), raw RGB data."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def _decode_bmp24(payload: bytes) -> np.ndarray:
    """BMP, 24 bits per pixel, BI_RGB (uncompressed), BGR rows padded to
    4 bytes, bottom-up unless height is negative."""
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodes here (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : width * 3].reshape(h, width, 3)[:, :, ::-1]  # BGR->RGB
    if height > 0:  # bottom-up storage
        img = img[::-1]
    return img.copy()


# Adam7 pass layout (RFC 2083 §2.6): (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(
    raw: bytes, rpos: int, h: int, stride: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Reverse the five PNG scanline filters over ``h`` rows of
    ``stride`` bytes starting at ``raw[rpos]`` (each row led by its
    filter byte). ``bpp`` is bytes per pixel — the filters' left
    offset, which is what makes this loop depth- and
    interlace-pass-agnostic. Returns (rows, next position)."""
    out = np.empty((h, stride), np.uint8)
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        f = raw[rpos]
        row = np.frombuffer(
            raw, np.uint8, stride, rpos + 1
        ).astype(np.int64)
        rpos += stride + 1
        if f == 0:  # None
            rec = row
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            lanes = row.reshape(-1, bpp)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        elif f == 2:  # Up
            rec = (row + prior) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential in x
            rec = np.empty(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 3:
                    rec[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (
                        b if pb <= pc_ else c
                    )
                    rec[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        prior = rec
        out[y] = rec.astype(np.uint8)
    return out, rpos


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG decode with the stdlib alone (zlib inflate + the five PNG
    scanline filters, RFC 2083): 8- and 16-bit depth (16-bit scales to
    8 via the high byte — the decode contract is HxWx3 uint8), color
    types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    non-interlaced AND Adam7-interlaced (per-pass unfilter + pixel
    scatter). Alpha is dropped, gray/palette expand to RGB, so the
    return shape is always HxWx3 uint8 like the other decoders."""
    import struct
    import zlib

    pos = 8
    idat: list[bytes] = []
    w = h = depth = ctype = interlace = None
    plte: np.ndarray | None = None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} (only 8/16)")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is not a valid combination")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    itemsize = depth // 8
    bpp = channels * itemsize
    raw = zlib.decompress(b"".join(idat))

    def to_px(rows: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """(ph, pw*bpp) filtered-byte rows -> (ph, pw, channels) uint8
        samples (16-bit keeps the big-endian high byte)."""
        px = rows.reshape(ph, pw, channels, itemsize)
        return px[..., 0]

    if interlace:
        full = np.zeros((h, w, channels), np.uint8)
        rpos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            rows, rpos = _png_unfilter(raw, rpos, ph, pw * bpp, bpp)
            full[y0::dy, x0::dx] = to_px(rows, ph, pw)
        if rpos != len(raw):
            raise ValueError("PNG IDAT size mismatch")
        px = full
    else:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT size mismatch")
        rows, _ = _png_unfilter(raw, 0, h, stride, bpp)
        px = to_px(rows, h, w)
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]].copy()
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # ctype 6: drop alpha


def encode_png(px: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG writer (8-bit RGB, non-interlaced, one IDAT): the
    image-column sink counterpart of :func:`_decode_png`, and the
    deterministic payload synthesizer for the multimodal pipeline tests
    and driver query. ``filters`` picks the per-row scanline filter
    (default: cycle through all five, so payloads exercise every
    unfilter path downstream)."""
    import struct
    import zlib

    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_png wants HxWx3 uint8")
    h, w = px.shape[:2]
    ch = 3
    flat = px.reshape(h, w * ch).astype(np.int64)
    filters = filters if filters is not None else [y % 5 for y in range(h)]
    raw = bytearray()
    prior = np.zeros(w * ch, np.int64)
    for y in range(h):
        f = filters[y]
        rec = flat[y]
        if f == 0:
            filt = rec
        elif f == 1:  # Sub
            a = np.concatenate([np.zeros(ch, np.int64), rec[:-ch]])
            filt = (rec - a) & 0xFF
        elif f == 2:  # Up
            filt = (rec - prior) & 0xFF
        elif f == 3:  # Average
            a = np.concatenate([np.zeros(ch, np.int64), rec[:-ch]])
            filt = (rec - ((a + prior) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            filt = np.empty(w * ch, np.int64)
            for x in range(w * ch):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c
                )
                filt[x] = (rec[x] - pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prior = rec

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload to (float32 samples in [-1, 1] shaped
    [n_frames, n_channels], sample_rate).

    REAL for RIFF/WAVE PCM (8/16/32-bit integer) — parseable with the
    stdlib ``wave`` module plus numpy, no codec libraries. Compressed
    audio (MP3/AAC/OGG/FLAC) raises NotImplementedError, the same
    environmental gate as ``decode_image``."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes without codec libraries; "
            "MP3/AAC/OGG/FLAC need ffmpeg/libsndfile (not in this "
            "container)"
        )
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:
        # non-PCM RIFF/WAVE (IEEE float, ADPCM, a-law, ...) must land on
        # the same recognizable gate as compressed formats, not crash a
        # Spark task with a bare wave.Error
        raise NotImplementedError(
            f"non-PCM RIFF/WAVE payload ({e}); only integer PCM decodes "
            f"without codec libraries"
        ) from e
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"PCM sample width {width} unsupported")
    return x.reshape(-1, n_ch), rate


def audio_features(payload: bytes, n_bands: int = 8) -> dict:
    """Spectral + time-domain features of a WAV payload: duration, RMS,
    zero-crossing rate, spectral centroid (Hz), and ``n_bands``
    log-spaced band energies from one rFFT over the mono downmix. All
    numpy — the real (non-stub) audio feature path."""
    x, rate = decode_audio(payload)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        return {
            "sample_rate": rate, "n_samples": 0, "duration_sec": 0.0,
            "rms": 0.0, "zcr": 0.0, "centroid_hz": 0.0,
            "bands": [0.0] * n_bands,
        }
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.mean(np.signbit(mono[:-1]) != np.signbit(mono[1:]))) \
        if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec * spec
    tot = float(power.sum())
    centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
    # log-spaced band edges from 20 Hz to Nyquist
    edges = np.geomspace(20.0, rate / 2.0, n_bands + 1)
    band_e = [
        float(power[(freqs >= lo) & (freqs < hi)].sum())
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_sec": n / rate,
        "rms": rms,
        "zcr": zcr,
        "centroid_hz": centroid,
        "bands": band_e,
    }


AUDIO_FEATURES_DDL = (
    "sample_rate int, n_samples long, duration_sec double, rms double, "
    "zcr double, centroid_hz double, bands array<double>"
)


def extract_audio_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    n_bands: int = 8,
) -> DataFrame:
    """Arrow-batched WAV feature extraction: (id, audio feature columns).

    Per-item Python is inherent to media decode (same shape as
    ``extract_features``); the batch boundary stays Arrow and oversized
    payloads should be size-capped upstream."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                f = audio_features(bytes(p), n_bands=n_bands)
                f[id_col] = pid
                rows.append(f)
            cols = [
                id_col, "sample_rate", "n_samples", "duration_sec",
                "rms", "zcr", "centroid_hz", "bands",
            ]
            yield pd.DataFrame(rows, columns=cols)

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_ddl}, {AUDIO_FEATURES_DDL}"
    )


def fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256-seeded floats.

    Keeps the full pipeline (batching, schema, joins downstream)
    exercisable without media codecs."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def with_media_meta(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Attach a typed metadata struct derived from the payload header."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("text/html").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length(F.col(payload_col)).alias("n_bytes"),
        ),
    )


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape discipline: payloads stay in Arrow buffers until the
    kernel touches them; output is (id, features array<float>). At scale,
    oversized payloads should be size-capped upstream (engine chunker).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fake_features(p, dim).tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_ddl}, features array<float>"
    )


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: emits (id, frame_idx, frame binary).

    Real video decode is stubbed — frames are deterministic slices of the
    payload so downstream schema/partitioning logic is testable."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for pid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                n_frames = max(len(p) // 64, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(pid)
                    idxs.append(fi)
                    frames.append(bytes(p[fi * 64 : (fi + 1) * 64]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, frame_idx int, frame binary"
    )


def resize_image(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Resize plumbing: (id, resized binary, width, height).

    Real pixel resampling is stubbed like ``decode_image`` (no codec libs
    here): the kernel emits a deterministic byte-downsample of the
    payload with the target geometry attached, so batch shapes, schema,
    and downstream joins are real."""

    target = width * height

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf[payload_col]:
                if p is None:
                    out.append(None)
                    continue
                if len(p) <= target:
                    out.append(bytes(p))
                else:
                    step = len(p) / target
                    pos = (np.arange(target) * step).astype(np.int64)
                    out.append(np.frombuffer(p, dtype=np.uint8)[pos].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, resized binary, width int, height int"
    )
