"""Real, dependency-free media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but that does NOT force a stubbed
decode: PNG (stdlib zlib + numpy unfiltering), binary netpbm (PPM/PGM),
and WAV (pure struct parsing) are all decodable with the standard
library. These codecs replace the round-3 sha256 stub as the default
decode path; only formats that genuinely need a native codec (JPEG,
MP4/H.264) remain stubbed, behind the same interface.

Everything here runs INSIDE Arrow-batched pandas UDFs / mapInPandas —
pure per-row byte work, no Spark imports, trivially serializable.

PNG subset: 8-bit greyscale (color type 0) and truecolor (color type 2),
no interlace; all five row filters implemented on decode, filter 0 on
encode. That covers every PNG our encoder produces and the common
ML-pipeline thumbnail case; unsupported color types raise ValueError
(caught and surfaced as a NULL decode by the operators).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) grey or (h, w, 3) RGB uint8 array as a real PNG
    (filter 0 rows, one zlib IDAT)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w = pixels.shape
        color_type, row_bytes = 0, pixels.reshape(h, w)
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w = pixels.shape[:2]
        color_type, row_bytes = 2, pixels.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + row_bytes[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG row filters (types 0-4) -> (h, w*channels) uint8."""
    stride = w * channels
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    raw = np.frombuffer(raw, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> dict:
    """Parse + fully decode a PNG (subset above). Returns width, height,
    channels, bit_depth, pixel_mean (exact double over all samples)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR")
    if bit_depth != 8 or color_type not in (0, 2):
        raise ValueError(f"unsupported PNG depth/color {bit_depth}/{color_type}")
    channels = 1 if color_type == 0 else 3
    pixels = _unfilter(zlib.decompress(idat), height, width, channels)
    return {
        "fmt": "png",
        "width": int(width),
        "height": int(height),
        "channels": channels,
        "bit_depth": int(bit_depth),
        "pixel_mean": float(pixels.mean()),
    }


# ---------------------------------------------------------------------------
# Binary netpbm (P5 grey / P6 RGB)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w) -> P5, (h, w, 3) -> P6; maxval 255."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    return magic + f" {w} {h} 255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> dict:
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not binary netpbm")
    channels = 1 if payload[:2] == b"P5" else 3
    # header: magic, whitespace-separated w h maxval, single whitespace
    parts: list[bytes] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(payload[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    n = w * h * channels
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return {
        "fmt": "ppm",
        "width": w,
        "height": h,
        "channels": channels,
        "bit_depth": 8,
        "pixel_mean": float(pixels.astype(np.float64).mean()),
    }


def decode_image(payload: bytes) -> dict:
    """Sniff + decode: PNG or binary netpbm. JPEG and other formats need
    a native codec and raise NotImplementedError (the stub boundary)."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG needs a native codec (not in container)")
    raise ValueError("unrecognized image format")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample — a real pixel operation (numpy index
    gather), not arithmetic on metadata."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)] if pixels.ndim == 2 else pixels[np.ix_(ys, xs)]


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """int16 mono/interleaved samples -> a real RIFF/WAVE file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Parse a WAV: rate/channels/frames/duration + exact RMS over PCM16."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        frames = w.getnframes()
        width = w.getsampwidth()
        if width != 2:
            raise ValueError("only PCM16 supported")
        data = np.frombuffer(w.readframes(frames), dtype="<i2").astype(np.float64)
    rms = float(np.sqrt(np.mean(data * data))) if data.size else 0.0
    return {
        "fmt": "wav",
        "sample_rate": rate,
        "channels": channels,
        "n_frames": frames,
        "duration_ms": int(frames * 1000 // rate),
        "rms": rms,
    }
