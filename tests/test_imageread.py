"""ImageRead + ColorMap tests."""

from pathlib import Path

import numpy as np
import pytest

from helpers import encode_bmp, encode_png
from vszip_tpu import VSZipError
from vszip_tpu.io.image_read import image_read

REF_IMAGE = Path("/root/reference/tests/image.png")


def _rand_img(shape, dtype=np.uint8, seed=0):
    rng = np.random.default_rng(seed)
    hi = 65536 if dtype == np.uint16 else 256
    return rng.integers(0, hi, shape).astype(dtype)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_filters(tmp_path, ft):
    img = _rand_img((23, 31, 3))
    p = tmp_path / f"f{ft}.png"
    p.write_bytes(encode_png(img, filter_type=ft))
    clip = image_read(str(p))
    assert clip.format.name == "RGB24"
    got = np.stack([np.asarray(pl[0]) for pl in clip.planes], axis=-1)
    np.testing.assert_array_equal(got, img)


def test_png_16bit_and_gray(tmp_path):
    img = _rand_img((10, 14, 3), np.uint16)
    p = tmp_path / "c16.png"
    p.write_bytes(encode_png(img))
    clip = image_read(str(p))
    assert clip.format.name == "RGB48"
    np.testing.assert_array_equal(np.asarray(clip.planes[1][0]), img[..., 1])

    g = _rand_img((9, 13, 1))
    p2 = tmp_path / "g.png"
    p2.write_bytes(encode_png(g, gray=True))
    clip2 = image_read(str(p2))
    assert clip2.format.name == "GRAY8"
    np.testing.assert_array_equal(np.asarray(clip2.planes[0][0]), g[..., 0])


def test_png_alpha(tmp_path):
    img = _rand_img((8, 8, 4))
    p = tmp_path / "a.png"
    p.write_bytes(encode_png(img, alpha=True))
    clip, aclip = image_read(str(p), alpha=True)
    np.testing.assert_array_equal(np.asarray(aclip.planes[0][0]), img[..., 3])


def test_multiframe_and_validate(tmp_path):
    a = _rand_img((6, 7, 3), seed=1)
    b = _rand_img((6, 7, 3), seed=2)
    pa, pb = tmp_path / "a.png", tmp_path / "b.png"
    pa.write_bytes(encode_png(a))
    pb.write_bytes(encode_png(b))
    clip = image_read([str(pa), str(pb)], validate=True)
    assert clip.num_frames == 2
    np.testing.assert_array_equal(np.asarray(clip.planes[0][1]), b[..., 0])
    # mismatched dims fail validation
    pc = tmp_path / "c.png"
    pc.write_bytes(encode_png(_rand_img((5, 7, 3))))
    with pytest.raises(VSZipError, match="do not match"):
        image_read([str(pa), str(pc)], validate=True)


@pytest.mark.parametrize(
    "chunks,transfer,primaries",
    [
        ({"srgb": True}, 13, 1),
        ({"gama": 100000}, 8, 1),
        ({"gama": 45455}, 4, 1),
        ({"gama": 35714}, 5, 1),
        ({"gama": 50000}, 2, 1),
        ({"cicp": (9, 16, 0, 1)}, 16, 9),
        ({"gama": 100000,
          "chrm": (31270, 32900, 64000, 33000, 30000, 60000, 15000, 6000)}, 8, 1),
        ({"gama": 100000,
          "chrm": (31270, 32900, 70800, 29200, 17000, 79700, 13100, 4600)}, 8, 9),
        ({"gama": 100000,
          "chrm": (11270, 32900, 70800, 29200, 17000, 79700, 13100, 4600)}, 8, 2),
    ],
    ids=str,
)
def test_color_chunk_props(tmp_path, chunks, transfer, primaries):
    p = tmp_path / "c.png"
    p.write_bytes(encode_png(_rand_img((4, 4, 3)), chunks=chunks))
    clip = image_read(str(p))
    assert clip.props["_Transfer"] == transfer
    assert clip.props["_Primaries"] == primaries


def test_bmp(tmp_path):
    img = _rand_img((9, 5, 3))
    p = tmp_path / "x.bmp"
    p.write_bytes(encode_bmp(img))
    clip = image_read(str(p))
    got = np.stack([np.asarray(pl[0]) for pl in clip.planes], axis=-1)
    np.testing.assert_array_equal(got, img)


@pytest.mark.skipif(not REF_IMAGE.is_file(), reason="reference image absent")
def test_real_photo_decodes():
    clip = image_read(str(REF_IMAGE))
    assert clip.width > 100 and clip.height > 100
    assert clip.format.name in ("RGB24", "RGB48")


def test_read_error():
    with pytest.raises(VSZipError, match="Failed to read"):
        image_read("/nonexistent/file.png")


def test_png_low_bit_depths_and_interlace(tmp_path):
    """1/2/4-bit grayscale and palette PNGs plus Adam7 interlacing — the
    reference's zigimg decodes all of these (src/vapoursynth/image_read.zig);
    PIL is the independent encoder here."""
    PIL = pytest.importorskip("PIL.Image")
    import io as _io

    rng = np.random.default_rng(3)

    # 1-bit gray (scales to 0/255 by bit replication), plain + interlaced
    g1 = (rng.integers(0, 2, (23, 37)) * 255).astype(np.uint8)
    for interlace, name in ((False, "g1.png"), (True, "g1i.png")):
        buf = _io.BytesIO()
        PIL.fromarray(g1).convert("1").save(
            buf, format="PNG", interlace=interlace)
        p = tmp_path / name
        p.write_bytes(buf.getvalue())
        clip = image_read(str(p))
        assert clip.format.name == "GRAY8"
        np.testing.assert_array_equal(np.asarray(clip.planes[0][0]), g1)

    # 2- and 4-bit palette (palette PNGs load as RGB24 + alpha, like zigimg)
    base = (rng.integers(0, 4, (23, 37)) * 80).astype(np.uint8)
    img = PIL.fromarray(base, "L").convert(
        "P", palette=PIL.ADAPTIVE, colors=4)
    want = np.asarray(img.convert("RGB"))
    for bits in (2, 4):
        buf = _io.BytesIO()
        img.save(buf, format="PNG", bits=bits)
        p = tmp_path / f"pal{bits}.png"
        p.write_bytes(buf.getvalue())
        clip = image_read(str(p))
        assert clip.format.name == "RGB24"
        got = np.stack([np.asarray(pl[0]) for pl in clip.planes], axis=-1)
        np.testing.assert_array_equal(got, want)

    # interlaced 8-bit RGB
    rgb = rng.integers(0, 256, (23, 37, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    PIL.fromarray(rgb).save(buf, format="PNG", interlace=True)
    p = tmp_path / "rgbi.png"
    p.write_bytes(buf.getvalue())
    clip = image_read(str(p))
    got = np.stack([np.asarray(pl[0]) for pl in clip.planes], axis=-1)
    np.testing.assert_array_equal(got, rgb)


def test_float32_pfm_to_rgbs(tmp_path):
    """float32 sources -> RGBS/GRAYS output (reference image_read.zig:440
    queryVideoFormat SampleType Float bps 32 for the float32 format)."""
    rng = np.random.default_rng(9)
    f = rng.random((6, 8, 3), np.float32)
    p = tmp_path / "img.pfm"
    p.write_bytes(b"PF\n8 6\n-1.0\n" + f[::-1].astype("<f4").tobytes())
    clip = image_read(str(p))
    assert clip.format.name == "RGBS"
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(clip.planes[c])[0], f[..., c])
    assert clip.props["zigimg_format"] == "float32"
    assert clip.props["zigimg_bits"] == 32

    g = rng.random((4, 5, 1), np.float32)
    pg = tmp_path / "img_g.pfm"
    pg.write_bytes(b"Pf\n5 4\n-1.0\n" + g[::-1].astype("<f4").tobytes())
    gclip, aclip = image_read(str(pg), alpha=True)
    assert gclip.format.name == "GRAYS"
    assert aclip.format.name == "GRAYS"
    np.testing.assert_array_equal(np.asarray(aclip.planes[0]),
                                  np.ones((1, 4, 5), np.float32))


def test_zigimg_props(tmp_path):
    """zigimg_file_path / zigimg_format / zigimg_bits frame props
    (reference src/vapoursynth/image_read.zig:348-350)."""
    img = _rand_img((6, 8, 3))
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.png"
    p1.write_bytes(encode_png(img))
    p2.write_bytes(encode_png(img))
    clip = image_read([str(p1), str(p2)])
    assert clip.props["zigimg_file_path"] == (str(p1), str(p2))
    assert clip.props["zigimg_format"] == "rgb24"
    assert clip.props["zigimg_bits"] == 8

    PIL = pytest.importorskip("PIL.Image")
    import io as _io

    g1 = (np.arange(64).reshape(8, 8) % 2 * 255).astype(np.uint8)
    buf = _io.BytesIO()
    PIL.fromarray(g1).convert("1").save(buf, format="PNG")
    low = tmp_path / "low.png"
    low.write_bytes(buf.getvalue())
    clip = image_read(str(low))
    assert clip.props["zigimg_format"] == "grayscale1"
    assert clip.props["zigimg_bits"] == 1


def test_netpbm_through_image_read(tmp_path):
    g = _rand_img((5, 7, 1))
    p = tmp_path / "img.pgm"
    p.write_bytes(b"P5 7 5 255\n" + g[..., 0].tobytes())
    clip = image_read(str(p))
    assert clip.format.name == "GRAY8"
    np.testing.assert_array_equal(np.asarray(clip.planes[0])[0], g[..., 0])
    assert clip.props["zigimg_format"] == "grayscale8"
