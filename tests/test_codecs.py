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
