"""Pure-stdlib image pixel codecs (PNG + BMP) for the multimodal path.

The reference treats media decode as a library call; this environment has
no codec libraries, but PNG's container is zlib + per-scanline filters
(both stdlib-expressible) and uncompressed BMP is plain bytes — so the
pixel stage for those formats is REAL here, not a stub. JPEG/audio/video
stay behind the pluggable `decoder` seam in operators/multimodal.py
(DCT/codec work genuinely needs the libraries).

Scope (documented like io/pdf.py's):
  * PNG: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
    gray+alpha, RGBA), filters 0-4, non-interlaced. Adam7 and 16-bit
    raise ValueError.
  * BMP: uncompressed 24/32-bit bottom-up or top-down.
  * `encode_png` writes a valid non-interlaced 8-bit PNG with a chosen
    filter type — used by tests to round-trip every filter path and by
    fixture generators; it is a real encoder (any PNG reader opens its
    output).

Numpy is used for the vectorizable filters (Up, Sub via per-channel
cumsum); Average/Paeth are sequential by definition and run as plain
loops — correctness-first; a real pixel corpus would plug Pillow through
the decoder seam and never hit this fallback.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 array (palette expanded to RGB)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, color={color}, "
            f"interlace={interlace}); stdlib scope is 8-bit non-interlaced"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: per-channel prefix sum reconstructs exactly
            line = (
                np.cumsum(line.reshape(w, ch), axis=0, dtype=np.uint32) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: vectorized wrap-add
            line = line + prev  # uint8 addition wraps mod 256
        elif f == 3:  # Average: sequential by definition
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential by definition
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line
        prev = line
    img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def _filter_line(line: np.ndarray, prev: np.ndarray, ch: int, f: int) -> np.ndarray:
    """Forward PNG filter (encode side) — exact inverse of the decode."""
    line = line.astype(np.int32)
    previ = prev.astype(np.int32)
    n = len(line)
    left = np.zeros(n, np.int32)
    left[ch:] = line[:-ch]
    ul = np.zeros(n, np.int32)
    ul[ch:] = previ[:-ch]
    if f == 0:
        out = line
    elif f == 1:
        out = line - left
    elif f == 2:
        out = line - previ
    elif f == 3:
        out = line - ((left + previ) >> 1)
    elif f == 4:
        pred = np.empty(n, np.int32)
        for x in range(n):
            pred[x] = _paeth(int(left[x]), int(previ[x]), int(ul[x]))
        out = line - pred
    else:
        raise ValueError(f)
    return (out % 256).astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """HxW, HxWx1, HxWx3 or HxWx4 uint8 -> valid non-interlaced 8-bit PNG
    (every scanline uses `filter_type`)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.uint8)
        raw.append(filter_type)
        raw += _filter_line(line, prev, ch, filter_type).tobytes()
        prev = line

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed 24-bit bottom-up BMP (4-byte row
    padding) — the mirror of decode_bmp; any image viewer opens it."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):
        line = img[y][:, [2, 1, 0]].astype(np.uint8).tobytes()  # RGB -> BGR
        pix += line + b"\x00" * (row_bytes - len(line))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
    )
    return bytes(header + pix)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> HxWx3 uint8 (BGR converted to RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    img = np.zeros((h, w, 3), np.uint8)
    for row in range(h):
        off = pix_off + row * row_bytes
        line = np.frombuffer(data, np.uint8, w * nch, off).reshape(w, nch)
        # bottom-up unless height is negative
        y = h - 1 - row if h_signed > 0 else row
        img[y] = line[:, [2, 1, 0]]  # BGR -> RGB
    return img


def decode_image(data: bytes) -> Optional[np.ndarray]:
    """Dispatch by magic bytes; None when the format needs a real codec
    library (JPEG/GIF pixels) or the payload is not an image."""
    b = data or b""
    try:
        if b[:8] == _PNG_SIG:
            return decode_png(b)
        if b[:2] == b"BM":
            return decode_bmp(b)
    except (ValueError, zlib.error, struct.error, IndexError):
        return None
    return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps — the standard thumbnail /
    fixed-input-shape step, fully numpy."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def luma(img: np.ndarray) -> np.ndarray:
    """Rec. 601 luma plane from 1/2/3/4-channel uint8."""
    if img.ndim == 2:
        return img.astype(np.float32)
    ch = img.shape[2]
    if ch in (1, 2):  # gray / gray+alpha
        return img[:, :, 0].astype(np.float32)
    rgb = img[:, :, :3].astype(np.float32)
    return rgb @ np.array([0.299, 0.587, 0.114], np.float32)


def pixel_stats(img: np.ndarray, hist_bins: int = 16) -> dict:
    """Deterministic pixel features: mean/std luma + normalized histogram."""
    y = luma(img)
    hist, _ = np.histogram(y, bins=hist_bins, range=(0.0, 256.0))
    n = y.size or 1
    return {
        "mean_luma": float(y.mean()) if y.size else 0.0,
        "std_luma": float(y.std()) if y.size else 0.0,
        "luma_hist": (hist / n).astype(np.float32).tolist(),
        "n_pixels": int(y.size),
    }
