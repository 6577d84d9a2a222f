"""Test helpers: stdlib-only PNG/BMP encoders to synthesize ImageRead inputs
with exact chunks (mirrors the reference suite's approach,
reference tests/helpers.py:82-188 — reimplemented)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + cid + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, gray: bool = False, alpha: bool = False,
               chunks: dict | None = None, filter_type: int = 0) -> bytes:
    """arr: (H, W, C) uint8/uint16.  chunks: {'gama': int, 'srgb': True,
    'chrm': 8-tuple, 'cicp': 4-tuple}."""
    h, w, c = arr.shape
    depth = 16 if arr.dtype == np.uint16 else 8
    ctype = {(True, False): 0, (True, True): 4, (False, False): 2,
             (False, True): 6}[(gray, alpha)]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    for key, val in (chunks or {}).items():
        if key == "gama":
            out += _chunk(b"gAMA", struct.pack(">I", val))
        elif key == "srgb":
            out += _chunk(b"sRGB", b"\x00")
        elif key == "chrm":
            out += _chunk(b"cHRM", struct.pack(">8I", *val))
        elif key == "cicp":
            out += _chunk(b"cICP", bytes(val))
    if depth == 16:
        rows = np.frombuffer(arr.astype(">u2").tobytes(), np.uint8).reshape(h, -1)
        bpp = c * 2
    else:
        rows = arr.astype(np.uint8).reshape(h, -1)
        bpp = c

    def paeth(a, b, cc):
        p = int(a) + int(b) - int(cc)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(cc))
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    raw = b""
    prev = np.zeros(rows.shape[1], np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            f = (cur - left) & 0xFF
        elif filter_type == 2:
            f = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            f = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # paeth
            f = np.zeros_like(cur)
            for i in range(len(cur)):
                a = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                f[i] = (cur[i] - paeth(a, prev[i], ul)) & 0xFF
        raw += bytes([filter_type]) + f.astype(np.uint8).tobytes()
        prev = cur
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return out


def encode_bmp(arr: np.ndarray) -> bytes:
    """arr: (H, W, 3) uint8 -> uncompressed 24-bit BMP."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body
