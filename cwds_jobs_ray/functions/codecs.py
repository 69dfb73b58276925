"""Pure-stdlib media codecs: PNG (zlib + numpy) and WAV (``wave``).

The sandbox has no imaging/audio libraries, but the PNG format (RFC 2083 /
the W3C PNG spec) needs only ``zlib`` and the WAV/RIFF format only the
stdlib ``wave`` module — so the two most common payload formats get REAL
decode/encode, replacing the sha256 stub for them (the stub remains the
fallback for formats that genuinely need an external codec; see
functions/multimodal.py). Everything here is deterministic, which is what
the golden-oracle tests require.

Scope (documented, asserted): 8-bit samples, color types 0 (grayscale) and
2 (RGB), no interlacing. The decoder handles all five PNG scanline filters
(None/Sub/Up/Average/Paeth); the encoder emits filter 0, which is always
valid. WAV is 16-bit mono/stereo PCM.

Reference parity note: the reference (cwds-jobs) has no media path at all —
this module exists for the training-data-pipeline surface of the brief
(multimodal columns as opaque binary + typed metadata).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color_type -> samples per pixel


# --------------------------------------------------------------------- PNG

def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as PNG.

    Filter 0 on every scanline + one zlib IDAT — the simplest spec-valid
    stream; any conformant decoder reads it.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, h, w = 0, *img.shape
        raw = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
        h, w = img.shape[:2]
        raw = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    # prepend the filter byte (0 = None) to each scanline
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), raw.reshape(h, -1)], axis=1)
    idat = zlib.compress(lines.tobytes(), 6)

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _unfilter(filt: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse the PNG scanline filters. ``filt`` is the decompressed
    stream reshaped to (h, 1 + w*c). Up and Sub are fully vectorized
    (Sub's left-recurrence is a per-channel cumulative sum); Average and
    Paeth carry an intra-row left dependency the spec makes sequential,
    so those rows fall back to a per-pixel loop — our own encoder never
    emits them, foreign PNGs may.
    """
    stride = w * c
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(filt[y, 0])
        row = filt[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: cumsum per channel position, mod 256
            row = np.cumsum(
                row.reshape(w, c).astype(np.uint32), axis=0,
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            row = (row + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            r32 = row.astype(np.int32)
            out = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = out[x - c] if x >= c else 0
                out[x] = (r32[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            row = out.astype(np.uint8)
        elif ftype == 4:  # Paeth
            r32 = row.astype(np.int32)
            out = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = out[x - c] if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else cc)
                out[x] = (r32[x] + pred) & 0xFF
            row = out.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        recon[y] = row
        prev = row
    return recon


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> (h, w) or (h, w, 3) uint8 array.

    Chunk CRCs are not verified (zlib's own checksum already guards the
    pixel data; corrupt streams fail in ``zlib.decompress`` or the
    reshape) — same tradeoff many fast decoders make.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} unsupported")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            meta = (w, h, _CHANNELS[color_type])
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    filt = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * c)
    recon = _unfilter(filt, h, w, c)
    img = recon.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (deterministic, up or down)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


# --------------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a WAV file."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes -> (samples int16 (n,) or (n, ch), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        ch, width, rate, n = (f.getnchannels(), f.getsampwidth(),
                              f.getframerate(), f.getnframes())
        if width != 2:
            raise NotImplementedError(f"WAV sample width {width} unsupported")
        raw = f.readframes(n)
    samples = np.frombuffer(raw, dtype=np.int16)
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


def sniff_kind(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'png' | 'wav' | None (unknown)."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None
