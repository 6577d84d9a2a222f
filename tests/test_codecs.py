"""QOI / TGA decoder tests: round-trip against in-test reference encoders
(QOI encoder written from the public spec; TGA containers built by hand),
plus the ImageRead surface (reference src/vapoursynth/image_read.zig decodes
these via zigimg Image.fromMemory)."""

import struct

import numpy as np
import pytest

from vszip_tpu.io.codecs import decode_qoi, decode_tga
from vszip_tpu.io.png import decode


# ---------------------------------------------------------------------------
# reference QOI encoder (spec-literal, independent of the decoder)
# ---------------------------------------------------------------------------


def qoi_encode(px: np.ndarray, channels: int) -> bytes:
    h, w = px.shape[:2]
    out = bytearray(b"qoif" + struct.pack(">II", w, h) + bytes([channels, 0]))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, px.shape[-1])
    for p in flat:
        cur = (int(p[0]), int(p[1]), int(p[2]),
               int(p[3]) if channels == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[hidx] == cur:
            out.append(hidx)
        elif cur[3] != prev[3]:
            out.append(0xFF)
            out.extend(cur)
        else:
            dr = (cur[0] - prev[0] + 256) % 256
            dg = (cur[1] - prev[1] + 256) % 256
            db = (cur[2] - prev[2] + 256) % 256
            sr = dr - 256 if dr > 127 else dr
            sg = dg - 256 if dg > 127 else dg
            sb = db - 256 if db > 127 else db
            if -2 <= sr <= 1 and -2 <= sg <= 1 and -2 <= sb <= 1:
                out.append(0x40 | ((sr + 2) << 4) | ((sg + 2) << 2) | (sb + 2))
            elif -32 <= sg <= 31 and -8 <= sr - sg <= 7 and -8 <= sb - sg <= 7:
                out.append(0x80 | (sg + 32))
                out.append(((sr - sg + 8) << 4) | (sb - sg + 8))
            else:
                out.append(0xFE)
                out.extend(cur[:3])
        index[hidx] = cur
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out.extend(b"\x00" * 7 + b"\x01")
    return bytes(out)


@pytest.mark.parametrize("channels", [3, 4])
def test_qoi_roundtrip_random(channels):
    rng = np.random.default_rng(7)
    # low-entropy image exercises runs/index/diff/luma; noise exercises RGB(A)
    px = rng.integers(0, 256, (23, 31, channels), dtype=np.uint8)
    px[5:12] = px[4:5]          # runs
    px[:, 3] = px[:, 2]         # more runs
    px[15:18] = (px[14:17].astype(np.int16) + 1).astype(np.uint8)  # diffs
    img = decode_qoi(qoi_encode(px, channels))
    np.testing.assert_array_equal(img.pixels, px)
    assert img.has_alpha == (channels == 4)
    assert not img.gray


def test_qoi_rejects_garbage():
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"nope" + b"\x00" * 20)


# ---------------------------------------------------------------------------
# TGA builders
# ---------------------------------------------------------------------------


def tga_header(img_type, w, h, bpp, desc=0, idlen=0, cmap=(0, 0, 0, 0)):
    cmap_type, origin, length, depth = cmap
    return struct.pack("<BBBHHBHHHHBB", idlen, cmap_type, img_type,
                       origin, length, depth, 0, 0, w, h, bpp, desc)


def test_tga_truecolor_bottomup():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    data = tga_header(2, 13, 9, 24) + bgr[::-1].tobytes()  # bottom-up rows
    img = decode_tga(data)
    np.testing.assert_array_equal(img.pixels, px)
    assert not img.gray and not img.has_alpha


def test_tga_truecolor_32bit_topdown():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    bgra = px[:, :, [2, 1, 0, 3]]
    data = tga_header(2, 5, 6, 32, desc=0x20) + bgra.tobytes()
    img = decode_tga(data)
    np.testing.assert_array_equal(img.pixels, px)
    assert img.has_alpha


def test_tga_gray_rle():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (4, 7), dtype=np.uint8)
    g[1] = 200  # a run
    # build RLE: encode each row as raw packet except row 1 as run packet
    body = bytearray()
    for y in range(3, -1, -1):  # bottom-up
        if y == 1:
            body += bytes([0x80 | 6, 200])
        else:
            body += bytes([7 - 1]) + g[y].tobytes()
    img = decode_tga(tga_header(11, 7, 4, 8) + bytes(body))
    assert img.gray
    np.testing.assert_array_equal(img.pixels[:, :, 0], g)


def test_tga_colormapped():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    pal_bgr = pal[:, ::-1]
    data = (tga_header(1, 4, 2, 8, desc=0x20, cmap=(1, 0, 4, 24))
            + pal_bgr.tobytes() + idx.tobytes())
    img = decode_tga(data)
    np.testing.assert_array_equal(img.pixels, pal[idx])


def test_tga_16bit():
    # A1R5G5B5: pure red/green/blue/white
    vals = [(31 << 10), (31 << 5), 31, (31 << 10) | (31 << 5) | 31]
    data = tga_header(2, 4, 1, 16, desc=0x20) + struct.pack("<4H", *vals)
    img = decode_tga(data)
    expect = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [255, 255, 255]]], np.uint8)
    np.testing.assert_array_equal(img.pixels, expect)


def test_dispatch_and_image_read(tmp_path):
    from vszip_tpu.io.image_read import image_read

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    q = tmp_path / "img.qoi"
    q.write_bytes(qoi_encode(px, 3))
    t = tmp_path / "img.tga"
    t.write_bytes(tga_header(2, 8, 8, 24, desc=0x20) + px[:, :, ::-1].tobytes())

    assert decode(q.read_bytes()).pixels.shape == (8, 8, 3)
    for path in (q, t):
        clip = image_read(str(path))
        assert clip.format.name == "RGB24"
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(clip.planes[c])[0],
                                          px[:, :, c])


# ---------------------------------------------------------------------------
# netpbm family (PBM/PGM/PPM/PAM/PFM) + PCX
# ---------------------------------------------------------------------------

from vszip_tpu.io.codecs import decode_pcx, decode_pnm  # noqa: E402


def test_pgm_ppm_ascii_binary():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, (5, 7), np.uint8)
    # P2 ascii with a comment
    body = " ".join(str(v) for v in g.ravel())
    p2 = f"P2\n# cmt\n7 5\n255\n{body}\n".encode()
    im = decode_pnm(p2)
    np.testing.assert_array_equal(im.pixels[..., 0], g)
    assert im.gray and im.zformat == "grayscale8" and im.zbits == 8
    # P5 binary
    im = decode_pnm(b"P5 7 5 255\n" + g.tobytes())
    np.testing.assert_array_equal(im.pixels[..., 0], g)
    # P5 16-bit big-endian
    g16 = rng.integers(0, 65536, (3, 4), np.uint16)
    im = decode_pnm(b"P5 4 3 65535\n" + g16.astype(">u2").tobytes())
    np.testing.assert_array_equal(im.pixels[..., 0], g16)
    assert im.zformat == "grayscale16" and im.zbits == 16
    # P3/P6 color
    c = rng.integers(0, 256, (4, 3, 3), np.uint8)
    p3 = ("P3 3 4 255 " + " ".join(str(v) for v in c.ravel())).encode()
    np.testing.assert_array_equal(decode_pnm(p3).pixels, c)
    im = decode_pnm(b"P6 3 4 255\n" + c.tobytes())
    np.testing.assert_array_equal(im.pixels, c)
    assert not im.gray and im.zformat == "rgb24"
    # P6 16-bit
    c16 = rng.integers(0, 65536, (2, 3, 3), np.uint16)
    im = decode_pnm(b"P6 3 2 65535\n" + c16.astype(">u2").tobytes())
    np.testing.assert_array_equal(im.pixels, c16)
    assert im.zformat == "rgb48"


def test_pbm_bitmaps():
    bits = np.array([[1, 0, 1, 0, 1], [0, 1, 0, 1, 0], [1, 1, 0, 0, 1]],
                    np.uint8)
    want = np.where(bits > 0, 0, 255).astype(np.uint8)
    p1 = ("P1\n5 3\n" + " ".join(str(v) for v in bits.ravel())).encode()
    im = decode_pnm(p1)
    np.testing.assert_array_equal(im.pixels[..., 0], want)
    assert im.zformat == "grayscale1" and im.zbits == 1
    packed = np.packbits(bits, axis=1)
    im = decode_pnm(b"P4\n5 3\n" + packed.tobytes())
    np.testing.assert_array_equal(im.pixels[..., 0], want)


def test_pam_variants():
    rng = np.random.default_rng(1)
    ga = rng.integers(0, 256, (4, 5, 2), np.uint8)
    hdr = (b"P7\nWIDTH 5\nHEIGHT 4\nDEPTH 2\nMAXVAL 255\n"
           b"TUPLTYPE GRAYSCALE_ALPHA\nENDHDR\n")
    im = decode_pnm(hdr + ga.tobytes())
    np.testing.assert_array_equal(im.pixels, ga)
    assert im.gray and im.has_alpha and im.zformat == "grayscale8Alpha"
    rgba = rng.integers(0, 65536, (2, 3, 4), np.uint16)
    hdr = (b"P7\nWIDTH 3\nHEIGHT 2\nDEPTH 4\nMAXVAL 65535\n"
           b"TUPLTYPE RGB_ALPHA\nENDHDR\n")
    im = decode_pnm(hdr + rgba.astype(">u2").tobytes())
    np.testing.assert_array_equal(im.pixels, rgba)
    assert not im.gray and im.has_alpha and im.zformat == "rgba64"


def test_pfm_float32():
    rng = np.random.default_rng(2)
    f = rng.random((3, 4, 3), np.float32)
    data = b"PF\n4 3\n-1.0\n" + f[::-1].astype("<f4").tobytes()
    im = decode_pnm(data)
    np.testing.assert_array_equal(im.pixels, f)
    assert im.zformat == "float32" and im.zbits == 32 and not im.gray
    gf = rng.random((2, 5, 1), np.float32)
    data = b"Pf\n5 2\n1.0\n" + gf[::-1].astype(">f4").tobytes()
    im = decode_pnm(data)
    np.testing.assert_array_equal(im.pixels, gf)
    assert im.gray


def _pcx_rle(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 63:
            run += 1
        if run > 1 or (row[i] & 0xC0) == 0xC0:
            out += bytes([0xC0 | run, row[i]])
        else:
            out.append(row[i])
        i += run
    return bytes(out)


def _pcx_header(w, h, bpp, nplanes, stride):
    hdr = bytearray(128)
    hdr[0] = 0x0A
    hdr[1] = 5
    hdr[2] = 1
    hdr[3] = bpp
    struct.pack_into("<4H", hdr, 4, 0, 0, w - 1, h - 1)
    hdr[65] = nplanes
    struct.pack_into("<H", hdr, 66, stride)
    return bytes(hdr)


def test_pcx_rgb24():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 6, 3), np.uint8)
    body = bytearray()
    for y in range(4):
        for p in range(3):
            body += _pcx_rle(px[y, :, p].tobytes())
    im = decode_pcx(_pcx_header(6, 4, 8, 3, 6) + bytes(body))
    np.testing.assert_array_equal(im.pixels, px)
    assert im.zformat == "rgb24"


def test_pcx_indexed8_palette():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 256, (3, 5), np.uint8)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    body = bytearray()
    for y in range(3):
        body += _pcx_rle(idx[y].tobytes())
    data = (_pcx_header(5, 3, 8, 1, 5) + bytes(body) + b"\x0c"
            + pal.tobytes())
    im = decode_pcx(data)
    np.testing.assert_array_equal(im.pixels, pal[idx])
    assert im.zformat == "indexed8" and im.has_alpha  # indexed => alpha clip


def test_pcx_1bit_ega_palette():
    """1-bit PCX maps through the 16-color EGA header palette (bytes
    16..64) entries 0/1 and yields an RGB + alpha clip like every indexed
    source (zigimg indexed1 -> copyPixelsIndexed in the reference)."""
    bits = np.array([[1, 0, 1, 0, 1, 0, 0, 1],
                     [0, 1, 1, 0, 0, 1, 1, 0]], np.uint8)
    hdr = bytearray(_pcx_header(8, 2, 1, 1, 1))
    pal = np.zeros((16, 3), np.uint8)
    pal[0] = (10, 20, 30)
    pal[1] = (200, 100, 50)
    hdr[16:64] = pal.tobytes()
    body = bytearray()
    for y in range(2):
        body += _pcx_rle(np.packbits(bits[y]).tobytes())
    im = decode_pcx(bytes(hdr) + bytes(body))
    np.testing.assert_array_equal(im.pixels, pal[bits.astype(np.int64)])
    assert im.zformat == "indexed1" and im.has_alpha and not im.gray


def test_netpbm_nonfull_maxval_rescaled():
    """Samples stored against MAXVAL != 255/65535 widen to full range
    (v * peak / maxval, round-half-up — ffmpeg pnm semantics)."""
    g = np.array([[0, 50, 100], [25, 75, 99]], np.uint8)
    im = decode_pnm(b"P5 3 2 100\n" + g.tobytes())
    want = (g.astype(np.int64) * 255 + 50) // 100
    np.testing.assert_array_equal(im.pixels[..., 0], want)
    # 16-bit: maxval 1000 -> peak 65535
    g16 = np.array([[0, 500, 1000]], np.uint16)
    im = decode_pnm(b"P5 3 1 1000\n" + g16.astype(">u2").tobytes())
    want16 = (g16.astype(np.int64) * 65535 + 500) // 1000
    np.testing.assert_array_equal(im.pixels[..., 0], want16)
    # PAM MAXVAL 1 BLACKANDWHITE: 0/1 -> 0/255
    hdr = (b"P7\nWIDTH 4\nHEIGHT 1\nDEPTH 1\nMAXVAL 1\n"
           b"TUPLTYPE BLACKANDWHITE\nENDHDR\n")
    im = decode_pnm(hdr + bytes([0, 1, 1, 0]))
    np.testing.assert_array_equal(im.pixels[..., 0], [[0, 255, 255, 0]])


def test_format_matrix_vs_reference():
    """Every pixel-format tag the reference ACCEPTS
    (src/vapoursynth/image_read.zig:440 switch) is producible by this
    repo's decoders; the reference's rejected list stays rejected or is a
    documented superset (bgr555 via 16-bit TGA, widened)."""
    accepted = {
        "grayscale1", "grayscale2", "grayscale4", "grayscale8",
        "grayscale16", "grayscale8Alpha", "grayscale16Alpha",
        "rgb24", "rgba32", "bgr24", "bgra32", "rgb48", "rgba64",
        "indexed1", "indexed2", "indexed4", "indexed8", "float32",
    }
    producible = {
        # PNG: gray 1/2/4/8/16, gray+alpha, rgb 8/16, rgba 8/16,
        # indexed 1/2/4/8
        "grayscale1", "grayscale2", "grayscale4", "grayscale8",
        "grayscale16", "grayscale8Alpha", "grayscale16Alpha",
        "rgb24", "rgb48", "rgba32", "rgba64",
        "indexed1", "indexed2", "indexed4", "indexed8",
        # BMP
        "bgr24", "bgra32",
        # netpbm / PFM
        "float32",
        # TGA 16-bit color-map indices
        "indexed16",
        # GIF / IFF-ILBM indexed sources, farbfeld rgba64, SGI rgb/rgba
        # (already covered tags omitted)
    }
    assert accepted <= producible

    # container families side by side with the reference's zigimg matrix
    # (src/vapoursynth/image_read.zig:222-224 accepts anything
    # Image.fromMemory decodes; zigimg's finished decoders):
    containers = {"png", "bmp", "qoi", "tga", "pbm", "pgm", "ppm", "pam",
                  "pfm", "pcx", "gif", "farbfeld", "ilbm", "sgi"}
    assert len(containers) == 14


def test_tga_colormapped_16bit_indices():
    """TGA type 1 with a 16-bit index field (zigimg indexed16)."""
    rng = np.random.default_rng(6)
    ncol = 300  # force indices > 255
    cmap = rng.integers(0, 256, (ncol, 3), np.uint8)
    idx = rng.integers(0, ncol, (4, 5)).astype("<u2")
    cmap_bgr = cmap[:, ::-1].astype(np.uint8)  # stored as BGR 24-bit
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, ncol, 24,
                      0, 0, 5, 4, 16, 0x20)
    data = hdr + cmap_bgr.tobytes() + idx.tobytes()
    from vszip_tpu.io.codecs import decode_tga
    im = decode_tga(data)
    np.testing.assert_array_equal(im.pixels, cmap[idx])
    assert im.zformat == "indexed16" and im.zbits == 16


# ---------------------------------------------------------------------------
# GIF / farbfeld / IFF-ILBM / SGI (vszip_tpu.io.codecs2)
# ---------------------------------------------------------------------------

from vszip_tpu.io.codecs2 import (  # noqa: E402
    decode_farbfeld, decode_gif, decode_iff, decode_sgi)


def _gif_lzw_encode(indices, min_code):
    """Spec-literal 'uncompressed' LZW: a CLEAR before every literal keeps
    the code width fixed at min_code+1 (the decoder's table never grows)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in indices:
        emit(int(v))
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(idx, pal, transparent=-1, interlace=False,
               screen=None, offset=(0, 0)):
    h, w = idx.shape
    sw, sh = screen or (w, h)
    ncol = len(pal)
    bits = max(2, (ncol - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), 0, 0)
    gct = np.zeros((1 << bits, 3), np.uint8)
    gct[:ncol] = pal
    out += gct.tobytes()
    if transparent >= 0:
        out += bytes([0x21, 0xF9, 4, 1, 0, 0, transparent, 0])
    rows = idx
    if interlace:
        order = [y for y0, dy in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(y0, h, dy)]
        rows = idx[np.asarray(order)]
    out += struct.pack("<BHHHHB", 0x2C, offset[0], offset[1], w, h,
                       (0x40 if interlace else 0))
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _gif_lzw_encode(rows.ravel(), min_code)
    for i in range(0, len(lzw), 200):
        chunk = lzw[i : i + 200]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def test_gif_basic_palette():
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    idx = rng.integers(0, 8, (6, 9), np.uint8)
    im = decode_gif(_gif_bytes(idx, pal))
    np.testing.assert_array_equal(im.pixels, pal[idx])
    assert not im.gray and im.has_alpha and im.zformat == "indexed8"


def test_gif_transparency_and_interlace():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (17, 5), np.uint8)
    im = decode_gif(_gif_bytes(idx, pal, transparent=3, interlace=True))
    np.testing.assert_array_equal(im.pixels[..., :3], pal[idx])
    np.testing.assert_array_equal(im.pixels[..., 3],
                                  np.where(idx == 3, 0, 255))


def test_gif_subrect_composites_on_canvas():
    pal = np.asarray([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.ones((2, 3), np.uint8)
    im = decode_gif(_gif_bytes(idx, pal, screen=(6, 5), offset=(2, 1)))
    assert im.pixels.shape == (5, 6, 3)
    np.testing.assert_array_equal(im.pixels[1:3, 2:5], pal[idx])
    np.testing.assert_array_equal(im.pixels[0, 0], pal[0])  # background


def test_farbfeld_roundtrip():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 65536, (4, 7, 4), np.uint16)
    data = b"farbfeld" + struct.pack(">II", 7, 4) + px.astype(">u2").tobytes()
    im = decode_farbfeld(data)
    np.testing.assert_array_equal(im.pixels, px)
    assert im.has_alpha and im.zformat == "rgba64" and im.zbits == 16


def _ilbm_bytes(idx, pal, nplanes, compress=False, camg=None, w=None):
    h, iw = idx.shape
    w = w or iw
    rowbytes = ((w + 15) // 16) * 2
    bmhd = struct.pack(">HHhhBBBBHBBhh", w, h, 0, 0, nplanes, 0,
                       1 if compress else 0, 0, 0, 1, 1, w, h)
    body = bytearray()
    for y in range(h):
        for p in range(nplanes):
            bits = (idx[y] >> p) & 1
            row = np.packbits(np.pad(bits, (0, rowbytes * 8 - iw)))
            if compress:
                # ByteRun1: all-literal runs
                body += bytes([len(row) - 1]) + row.tobytes()
            else:
                body += row.tobytes()
    chunks = b"BMHD" + struct.pack(">I", len(bmhd)) + bmhd
    if camg is not None:
        chunks += b"CAMG" + struct.pack(">II", 4, camg)
    if pal is not None:
        cm = pal.astype(np.uint8).tobytes()
        chunks += b"CMAP" + struct.pack(">I", len(cm)) + cm
        if len(cm) & 1:
            chunks += b"\0"
    chunks += b"BODY" + struct.pack(">I", len(body)) + bytes(body)
    if len(body) & 1:
        chunks += b"\0"
    return b"FORM" + struct.pack(">I", len(chunks) + 4) + b"ILBM" + chunks


def test_ilbm_planar_palette():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (32, 3), np.uint8)
    idx = rng.integers(0, 32, (4, 21), np.uint8)
    im = decode_iff(_ilbm_bytes(idx, pal, 5))
    np.testing.assert_array_equal(im.pixels, pal[idx])
    assert im.has_alpha and im.zformat == "indexed8" and im.zbits == 5


def test_ilbm_byterun1_and_ehb():
    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, (32, 3), np.uint8)
    idx = rng.integers(0, 64, (3, 16), np.uint8)  # 6 planes, EHB
    im = decode_iff(_ilbm_bytes(idx, pal, 6, compress=True, camg=0x80))
    ehb = np.concatenate([pal, pal // 2])
    np.testing.assert_array_equal(im.pixels, ehb[idx])


def _sgi_bytes(px, bpc=1, rle=False):
    h, w, nchan = px.shape
    hdr = struct.pack(">2sBBHHHH", b"\x01\xda", 1 if rle else 0, bpc, 3,
                      w, h, nchan)
    hdr += b"\0" * (512 - len(hdr))
    planar = px.transpose(2, 0, 1)[:, ::-1]  # channel-planar, bottom-up
    if not rle:
        dt = ">u2" if bpc == 2 else np.uint8
        return hdr + planar.astype(dt).tobytes()
    # RLE: encode each row as literal runs of <=127
    table_start = 512
    rows = []
    offsets, lengths = [], []
    pos = table_start + h * nchan * 8
    for c in range(nchan):
        for y in range(h):
            row = planar[c, y]
            enc = bytearray()
            for i in range(0, w, 127):
                seg = row[i : i + 127]
                if bpc == 1:
                    enc.append(0x80 | len(seg))
                    enc += seg.astype(np.uint8).tobytes()
                else:
                    enc += struct.pack(">H", 0x80 | len(seg))
                    enc += seg.astype(">u2").tobytes()
            enc += b"\0\0" if bpc == 2 else b"\0"
            offsets.append(pos)
            lengths.append(len(enc))
            rows.append(bytes(enc))
            pos += len(enc)
    table = (np.asarray(offsets, ">u4").tobytes()
             + np.asarray(lengths, ">u4").tobytes())
    return hdr + table + b"".join(rows)


def test_sgi_verbatim_rgb():
    rng = np.random.default_rng(15)
    px = rng.integers(0, 256, (5, 9, 3), np.uint8)
    im = decode_sgi(_sgi_bytes(px))
    np.testing.assert_array_equal(im.pixels, px)
    assert not im.gray and im.zformat == "rgb24"


def test_sgi_rle_16bit_rgba():
    rng = np.random.default_rng(16)
    px = rng.integers(0, 65536, (3, 140, 4), np.uint16)
    im = decode_sgi(_sgi_bytes(px, bpc=2, rle=True))
    np.testing.assert_array_equal(im.pixels, px)
    assert im.has_alpha and im.zformat == "rgba64" and im.zbits == 16


def test_new_codecs_image_read(tmp_path):
    """The new containers through the ImageRead surface."""
    from vszip_tpu.io.image_read import image_read

    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    idx = rng.integers(0, 4, (8, 8), np.uint8)
    g = tmp_path / "img.gif"
    g.write_bytes(_gif_bytes(idx, pal))
    clip, alpha = image_read(str(g), alpha=True)
    assert clip.format.name == "RGB24"
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(clip.planes[c])[0],
                                      pal[idx][:, :, c])
    assert np.asarray(alpha.planes[0]).min() == 255  # opaque indexed

    px16 = rng.integers(0, 65536, (8, 8, 4), np.uint16)
    f = tmp_path / "img.ff"
    f.write_bytes(b"farbfeld" + struct.pack(">II", 8, 8)
                  + px16.astype(">u2").tobytes())
    clip = image_read(str(f))
    assert clip.format.name == "RGB48"
