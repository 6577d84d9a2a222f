"""Deterministic test fixtures.

The reference suite derives all inputs from one 1920x1080 photo
(reference tests/conftest.py:73-135): a 640x320 RGB24 crop of
tests/image.png, plus a 3-frame vertically-shifted temporal variant
(reference tests/conftest.py:138-167).  This suite anchors to the SAME
content: the photo is decoded with the in-repo PNG decoder and cropped with
the reference's exact geometry (left = width-640, bottom = height-320), so
content-level comparisons against reference numbers (e.g. the SSIMULACRA2
68.625 anchor) are meaningful.  Set VSZIP_TEST_IMAGE to point elsewhere.

Format conversions mirror the fixture pipeline's semantics:
* RGB -> YUV via BT.709 limited-range matrix (the reference uses matrix=1),
  box-averaged chroma subsampling for 4:2:0/4:2:2 (documented deviation:
  the reference resamples through zimg Bilinear).
* integer depth changes by bit shift (zimg's integer depth conversion),
  float formats normalized so limited-range maps to [0,1] luma / [-0.5,0.5]
  chroma and RGB to [0,1].
Geometry variants reproduce the reference's full/odd/tiny scheme
(reference tests/conftest.py:108-121).
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path

import numpy as np

from vszip_tpu import Clip, get_format
from vszip_tpu.core.format import ColorFamily, SampleType

W, H = 640, 320

IMAGE = Path(
    os.environ.get("VSZIP_TEST_IMAGE", "/root/reference/tests/image.png")
)


@lru_cache(maxsize=1)
def _photo_planes() -> tuple:
    """(3, Himg, Wimg) uint8 planes of the full reference photo."""
    from vszip_tpu.io.image_read import image_read

    clip = image_read(str(IMAGE))
    assert clip.format.name == "RGB24", clip.format.name
    return tuple(np.asarray(p)[0] for p in clip.planes)


def _crop(top: int = 0) -> np.ndarray:
    """(H, W, 3) uint8: the reference crop (right-top corner region), rows
    shifted down by `top` (reference tests/conftest.py:142-147)."""
    planes = _photo_planes()
    ih, iw = planes[0].shape
    return np.stack(
        [p[top : top + H, iw - W : iw] for p in planes], axis=-1
    )


def source_rgb24() -> Clip:
    """Single-frame 640x320 RGB24 crop of the reference photo."""
    u8 = _crop(0)
    planes = tuple(u8[None, :, :, c] for c in range(3))
    return Clip.from_planes(planes, get_format("RGB24"))


def temporal_rgb24() -> Clip:
    """3-frame clip; frame n is the crop shifted down n rows."""
    u8 = np.stack([_crop(n) for n in range(3)])
    planes = tuple(u8[:, :, :, c] for c in range(3))
    return Clip.from_planes(planes, get_format("RGB24"))


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

# BT.709 RGB -> YCbCr coefficients
_KR, _KB = 0.2126, 0.0722
_KG = 1.0 - _KR - _KB


def _rgb_to_yuv_f(r, g, b):
    """Full-range [0,1] RGB -> analog Y [0,1], Cb/Cr [-0.5, 0.5] (BT.709)."""
    y = _KR * r + _KG * g + _KB * b
    cb = (b - y) / (2.0 * (1.0 - _KB))
    cr = (r - y) / (2.0 * (1.0 - _KR))
    return y, cb, cr


def _box_down(a: np.ndarray, fw: int, fh: int) -> np.ndarray:
    """Box-average downsample of (N,H,W) by integer factors."""
    n, h, w = a.shape
    return a.reshape(n, h // fh, fh, w // fw, fw).mean(axis=(2, 4))


def convert(clip: Clip, fmt_name: str) -> Clip:
    """Convert an RGB24 source clip to the named format."""
    fmt = get_format(fmt_name)
    src = clip.numpy()
    r, g, b = (p.astype(np.float64) / 255.0 for p in src.planes)

    if fmt.color_family is ColorFamily.RGB:
        planes = [r, g, b]
        if fmt.sample_type is SampleType.FLOAT:
            out = [p.astype(fmt.storage_dtype) for p in planes]
        else:
            peak = (1 << fmt.bits_per_sample) - 1
            # integer RGB depth change: shift semantics (v << (bits-8))
            shift = 1 << (fmt.bits_per_sample - 8)
            out = [
                (np.clip(np.round(p * 255.0), 0, 255) * shift).astype(fmt.storage_dtype)
                if fmt.bits_per_sample > 8
                else np.clip(np.round(p * 255.0), 0, peak).astype(fmt.storage_dtype)
                for p in planes
            ]
        return Clip.from_planes(out, fmt, src.props)

    y, cb, cr = _rgb_to_yuv_f(r, g, b)
    fw, fh = 1 << fmt.subsampling_w, 1 << fmt.subsampling_h
    if fw > 1 or fh > 1:
        cb = _box_down(cb, fw, fh)
        cr = _box_down(cr, fw, fh)

    if fmt.color_family is ColorFamily.GRAY:
        chans = [(y, False)]
    else:
        chans = [(y, False), (cb, True), (cr, True)]

    out = []
    for v, chroma in chans:
        if fmt.sample_type is SampleType.FLOAT:
            out.append(v.astype(fmt.storage_dtype))
        else:
            sh = fmt.bits_per_sample - 8
            if chroma:
                q = np.round(v * 224.0 + 128.0)
            else:
                q = np.round(v * 219.0 + 16.0)
            q = np.clip(q, 0, 255) * (1 << sh)
            out.append(q.astype(fmt.storage_dtype))
    return Clip.from_planes(out, fmt, src.props)


def geometry_variant(clip: Clip, geometry: str) -> Clip:
    """full / odd / tiny geometry variants
    (reference tests/conftest.py:108-121): `odd` shaves the subsampling-mod
    minimum off right/bottom so dims stop being tile multiples; `tiny` is a
    13x7-ish interior crop forcing scalar-tail / masked-edge paths."""
    fmt = clip.format
    wmod, hmod = 1 << fmt.subsampling_w, 1 << fmt.subsampling_h
    if geometry == "full":
        return clip
    if geometry == "odd":
        return crop(clip, right=wmod, bottom=hmod)
    if geometry == "tiny":
        tw, th = 13 - 13 % wmod, 7 - 7 % hmod
        return crop_abs(clip, width=tw, height=th, left=200, top=100)
    raise ValueError(f"unknown geometry {geometry!r}")


def crop(clip: Clip, left=0, right=0, top=0, bottom=0) -> Clip:
    w, h = clip.width - left - right, clip.height - top - bottom
    return crop_abs(clip, w, h, left, top)


def crop_abs(clip: Clip, width: int, height: int, left: int = 0, top: int = 0) -> Clip:
    fmt = clip.format
    planes = []
    for p, arr in enumerate(clip.planes):
        sw = fmt.subsampling_w if p else 0
        sh = fmt.subsampling_h if p else 0
        l, t = left >> sw, top >> sh
        pw, ph = width >> sw, height >> sh
        planes.append(arr[:, t : t + ph, l : l + pw])
    return Clip.from_planes(planes, fmt, clip.props)
