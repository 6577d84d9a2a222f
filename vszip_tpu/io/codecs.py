"""QOI and TGA decoders for ImageRead.

The reference decodes any zigimg-supported container via ``Image.fromMemory``
(reference src/vapoursynth/image_read.zig:222-224); this repo implements the
formats with real-world use — PNG/BMP (io/png.py) plus QOI and TGA here —
as pure host-side decoders (image decode happens once at clip-build time and
never touches the TPU dataflow).

QOI: the complete spec (qoiformat.org) — RGB/RGBA ops, index table,
diff/luma deltas, runs.  TGA: types 1/2/3 and their RLE variants 9/10/11,
8-bit grayscale, 16-bit (A1R5G5B5), 24/32-bit truecolor, color-mapped with
16/24/32-bit palettes, bottom-up and top-down orientation.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import DecodedImage


def decode_qoi(data: bytes) -> DecodedImage:
    if data[:4] != b"qoif":
        raise ValueError("not a QOI file")
    w, h = struct.unpack(">II", data[4:12])
    channels, _colorspace = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"unsupported QOI channel count {channels}")
    if w == 0 or h == 0:
        raise ValueError("empty QOI image")

    npx = w * h
    out = np.empty((npx, 4), np.uint8)
    index = np.zeros((64, 4), np.uint8)
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    buf = data
    while i < npx:
        op = buf[pos]
        pos += 1
        if op == 0xFE:  # QOI_OP_RGB
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif op == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # QOI_OP_INDEX
                e = index[op & 0x3F]
                r, g, b, a = int(e[0]), int(e[1]), int(e[2]), int(e[3])
                out[i] = (r, g, b, a)
                i += 1
                continue
            if tag == 1:  # QOI_OP_DIFF
                r = (r + ((op >> 4) & 3) - 2) & 0xFF
                g = (g + ((op >> 2) & 3) - 2) & 0xFF
                b = (b + (op & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                dg = (op & 0x3F) - 32
                drdb = buf[pos]
                pos += 1
                r = (r + dg - 8 + ((drdb >> 4) & 0xF)) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg - 8 + (drdb & 0xF)) & 0xFF
            else:  # QOI_OP_RUN
                run = (op & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
                continue
        out[i] = (r, g, b, a)
        i += 1
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)

    px = out.reshape(h, w, 4)
    if channels == 3:
        px = px[:, :, :3]
    return DecodedImage(np.ascontiguousarray(px), False, channels == 4, {})


def _tga_unrle(data: bytes, pos: int, npx: int, bpp: int) -> np.ndarray:
    """TGA RLE: packets of (header byte, pixel(s)); high bit = run."""
    out = np.empty(npx * bpp, np.uint8)
    i = 0
    while i < npx * bpp:
        hdr = data[pos]
        pos += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:  # run packet: one pixel repeated
            px = np.frombuffer(data, np.uint8, bpp, pos)
            pos += bpp
            out[i : i + count * bpp] = np.tile(px, count)
        else:  # raw packet
            n = count * bpp
            out[i : i + n] = np.frombuffer(data, np.uint8, n, pos)
            pos += n
        i += count * bpp
    return out


def _tga_to_rgba(arr: np.ndarray, bpp_bits: int) -> tuple[np.ndarray, bool]:
    """(H*W, bytes) raw TGA pixels -> ((H*W, C) RGB(A) u8, has_alpha)."""
    if bpp_bits == 8:
        return arr.reshape(-1, 1), False
    if bpp_bits == 16:  # A1R5G5B5 little-endian
        v = arr.reshape(-1, 2).astype(np.uint16)
        v = v[:, 0] | (v[:, 1] << 8)
        r = ((v >> 10) & 31).astype(np.uint8)
        g = ((v >> 5) & 31).astype(np.uint8)
        b = (v & 31).astype(np.uint8)
        scale = lambda c: ((c.astype(np.uint16) * 255 + 15) // 31).astype(np.uint8)  # noqa: E731
        return np.stack([scale(r), scale(g), scale(b)], -1), False
    if bpp_bits == 24:  # BGR
        px = arr.reshape(-1, 3)[:, ::-1]
        return px, False
    if bpp_bits == 32:  # BGRA
        px = arr.reshape(-1, 4)
        return np.concatenate([px[:, 2::-1], px[:, 3:4]], -1), True
    raise ValueError(f"unsupported TGA depth {bpp_bits}")


def decode_tga(data: bytes) -> DecodedImage:
    if len(data) < 18:
        raise ValueError("not a TGA file")
    (idlen, cmap_type, img_type, cmap_origin, cmap_len, cmap_depth,
     _xo, _yo, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"unsupported TGA image type {img_type}")
    if w == 0 or h == 0:
        raise ValueError("empty TGA image")
    pos = 18 + idlen
    cmap = None
    if cmap_type == 1:
        cbytes = (cmap_depth + 7) // 8
        raw = np.frombuffer(data, np.uint8, cmap_len * cbytes, pos)
        cmap, cmap_alpha = _tga_to_rgba(raw, cmap_depth)
        pos += cmap_len * cbytes

    npx = w * h
    pbytes = (bpp + 7) // 8
    if img_type >= 9:  # RLE
        raw = _tga_unrle(data, pos, npx, pbytes)
    else:
        raw = np.frombuffer(data, np.uint8, npx * pbytes, pos).copy()

    if img_type in (1, 9):  # color-mapped
        if cmap is None:
            raise ValueError("color-mapped TGA without a color map")
        idx = raw.astype(np.int64) - cmap_origin
        px = cmap[idx]
        has_alpha = cmap_alpha
        gray = False
    else:
        px, has_alpha = _tga_to_rgba(raw, bpp)
        gray = img_type in (3, 11)

    px = px.reshape(h, w, -1)
    if not desc & 0x20:  # bit 5 clear: bottom-up origin
        px = px[::-1]
    if gray:
        px = px[:, :, :1]
    return DecodedImage(np.ascontiguousarray(px), gray, has_alpha, {})
