"""Dependency-free image codecs for the multimodal pipeline.

The sandbox has no PIL/libav, but two image families are fully
decodable from their PUBLIC specs with nothing but numpy:

- Netpbm (en.wikipedia.org/wiki/Netpbm): P5 (binary PGM, grayscale) and
  P6 (binary PPM, RGB) — whitespace-separated header then raw samples.
- BMP (the Windows BITMAPINFOHEADER format): 14-byte file header +
  40-byte info header, 24bpp uncompressed BI_RGB, BGR samples in
  4-byte-padded rows, bottom-up unless height is negative.

These make the multimodal operators real end-to-end for the formats the
container can exercise; anything else falls back to the documented
byte-fold stub (multimodal.py). All kernels are numpy-vectorized — they
run inside Arrow-batched mapInPandas, so per-image Python overhead is
one call, not per-pixel.
"""

from __future__ import annotations

import struct

import numpy as np

DECODABLE_FORMATS = ("ppm", "pgm", "bmp")


# ------------------------------------------------------------------ netpbm
def _pnm_header(buf: bytes) -> tuple[bytes, list[int], int]:
    """Parse magic + 3 header ints (2 for the caller to ignore maxval
    handling if P5/P6 share shape), skipping whitespace and # comments.
    Returns (magic, [w, h, maxval], data_offset)."""
    magic = buf[0:2]
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    return magic, vals, pos + 1  # single whitespace after maxval


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (grayscale, replicated to 3 channels) → HxWx3 u8."""
    magic, (w, h, maxval), off = _pnm_header(buf)
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm image: {magic!r}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(buf, np.uint8, count=w * h * ch, offset=off)
    arr = arr.reshape(h, w, ch)
    return np.repeat(arr, 3, axis=2) if ch == 1 else arr.copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 u8 → P6 bytes (the round-trip encoder for sinks/tests)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr.astype(np.uint8)).tobytes()


# --------------------------------------------------------------------- bmp
def decode_bmp(buf: bytes) -> np.ndarray:
    """24bpp uncompressed BI_RGB BITMAPINFOHEADER → HxWx3 u8 (RGB)."""
    if buf[0:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(buf, np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb[::-1].copy() if flipped else rgb.copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 u8 (RGB) → 24bpp bottom-up BI_RGB bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    raw = body.tobytes()
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(raw), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + raw


# ----------------------------------------------------------------- kernels
def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    fmt = (fmt or "").lower()
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise ValueError(f"no dependency-free decoder for format {fmt!r}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps (pure numpy)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray) -> list[float]:
    """Real 8-dim image descriptor: dims, per-channel means, gray std,
    horizontal edge energy, dark-pixel fraction."""
    gray = arr.astype(np.float32).mean(axis=2)
    edge = float(np.abs(np.diff(gray, axis=1)).mean()) if arr.shape[1] > 1 \
        else 0.0
    return [
        float(arr.shape[0]), float(arr.shape[1]),
        float(arr[:, :, 0].mean()), float(arr[:, :, 1].mean()),
        float(arr[:, :, 2].mean()), float(gray.std()),
        edge, float((gray < 32.0).mean()),
    ]


# --------------------------------------------------------------------- wav
def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (16-bit LE or 8-bit unsigned) → (samples float32 in
    [-1, 1] shaped (n, channels), sample_rate). Chunk-walks the RIFF
    container per the public spec — ignores LIST/INFO and other chunks."""
    if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    else:
        samples = (np.frombuffer(data, np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float32 in [-1, 1] → 16-bit PCM RIFF bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    channels = samples.shape[1]
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --------------------------------------------------------------------- avi
def decode_avi(buf: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed AVI (RIFF 'AVI ', '00db'/'00dc' raw DIB frames) →
    (frames (n,h,w,3) u8 RGB, fps). Container per the public RIFF/AVI
    spec: LIST hdrl → avih carries frame timing and dims; LIST movi
    carries per-frame chunks whose payload is a bottom-up BGR DIB body
    (same row packing as BMP, no file header)."""
    if buf[0:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    usec_per_frame, w, h = 0, 0, 0
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal usec_per_frame, w, h
        pos = start
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)  # skip list type tag
            elif cid == b"avih":
                usec_per_frame = struct.unpack_from("<I", buf, body_at)[0]
                w, h = struct.unpack_from("<II", buf, body_at + 32)
            elif cid[2:4] in (b"db", b"dc") and size:
                stride = (w * 3 + 3) & ~3
                rows = np.frombuffer(buf, np.uint8, count=stride * h,
                                     offset=body_at)
                rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                frames.append(rows[::-1, :, ::-1].copy())  # bottom-up BGR
            pos = body_at + size + (size & 1)

    walk(12, len(buf))
    if not frames:
        raise ValueError("no video frames in AVI")
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return np.stack(frames), fps


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """(n,h,w,3) u8 RGB → minimal uncompressed AVI ('DIB ' video stream,
    one '00db' chunk per frame)."""
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<IIIIIIIIII4I", int(1e6 / fps), frame_bytes * int(fps),
                       0, 0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, int(fps), 0, n, frame_bytes, 0, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(
        chunk(b"00db", _dib_body(frames[i], stride)) for i in range(n))
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _dib_body(frame: np.ndarray, stride: int) -> bytes:
    h, w = frame.shape[:2]
    body = np.zeros((h, stride), np.uint8)
    body[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return body.tobytes()


def video_features(frames: np.ndarray, fps: float) -> list[float]:
    """Real 8-dim video descriptor: frame count, fps, dims, mean
    brightness, brightness std across frames, temporal change energy,
    dark-frame fraction."""
    gray = frames.astype(np.float32).mean(axis=3)  # (n,h,w)
    per_frame = gray.mean(axis=(1, 2))
    temporal = float(np.abs(np.diff(per_frame)).mean()) \
        if len(per_frame) > 1 else 0.0
    return [
        float(frames.shape[0]), float(fps),
        float(frames.shape[1]), float(frames.shape[2]),
        float(per_frame.mean()), float(per_frame.std()),
        temporal, float((per_frame < 32.0).mean()),
    ]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """Real 8-dim audio descriptor: duration, rate, channels, RMS, peak,
    zero-crossing rate, mean, clipping fraction — the standard cheap
    quality/filter signals for audio corpora."""
    mono = samples.mean(axis=1)
    zc = float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 \
        else 0.0
    return [
        float(len(mono)) / rate, float(rate), float(samples.shape[1]),
        float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0,
        float(np.abs(mono).max()) if len(mono) else 0.0,
        zc, float(mono.mean()) if len(mono) else 0.0,
        float((np.abs(samples) >= 32767.0 / 32768.0).mean()),
    ]
