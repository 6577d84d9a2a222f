"""Deterministic test fixtures.

The reference suite derives all inputs from one 1920x1080 photo via the
VapourSynth resize pipeline (reference tests/conftest.py:73-135).  That
pipeline (zimg) isn't available here, so this suite generates an equivalent
deterministic source procedurally: a 640x320 RGB24 image with smooth
gradients, multi-scale sinusoids, sharp edges, disks, and pixel noise — the
same mix of content classes (flat areas, edges, texture, noise) the photo
provides — plus a 3-frame vertically-shifted temporal variant
(reference tests/conftest.py:138-167).

Format conversions mirror the fixture pipeline's semantics:
* RGB -> YUV via BT.709 limited-range matrix (the reference uses matrix=1),
  box-averaged chroma subsampling for 4:2:0/4:2:2.
* integer depth changes by bit shift (zimg's integer depth conversion),
  float formats normalized so limited-range maps to [0,1] luma / [-0.5,0.5]
  chroma and RGB to [0,1].
Geometry variants reproduce the reference's full/odd/tiny scheme
(reference tests/conftest.py:108-121).
"""

from __future__ import annotations

import numpy as np

from vszip_tpu import Clip, get_format
from vszip_tpu.core.format import ColorFamily, SampleType

W, H = 640, 320


def _rgb_image(shift: int = 0) -> np.ndarray:
    """(H, W, 3) float in [0,1].  `shift` rolls content down by whole rows,
    emulating the reference's shifted-crop temporal frames."""
    # generate taller field and crop, so shifted frames share real content
    hh = H + 8
    y, x = np.mgrid[0:hh, 0:W].astype(np.float64)
    y -= shift
    r = (
        0.45
        + 0.25 * np.sin(2 * np.pi * x / 97.0)
        + 0.18 * np.sin(2 * np.pi * (x + 2 * y) / 13.0)
    )
    g = (
        0.5
        + 0.3 * np.cos(2 * np.pi * y / 61.0)
        + 0.1 * np.sign(np.sin(2 * np.pi * x / 41.0))  # hard vertical edges
    )
    b = 0.35 + 0.4 * (x / W) * (y / hh)
    # disks of varying radius (sharp circular edges)
    for cx, cy, rad, amp in [(100, 80, 40, 0.3), (420, 200, 70, -0.25), (550, 60, 25, 0.35)]:
        mask = (x - cx) ** 2 + (y - cy) ** 2 < rad**2
        r = np.where(mask, r + amp, r)
        g = np.where(mask, g - amp / 2, g)
    # deterministic pixel noise (fixed seed, position-independent of shift)
    rng = np.random.default_rng(1234)
    noise = rng.normal(0.0, 0.02, size=(hh, W, 3))
    img = np.stack([r, g, b], axis=-1) + noise
    img = np.clip(img, 0.0, 1.0)
    return img[shift : shift + H]


def source_rgb24() -> Clip:
    """Single-frame 640x320 RGB24 clip."""
    img = _rgb_image(0)
    u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    planes = tuple(u8[None, :, :, c] for c in range(3))
    return Clip.from_planes(planes, get_format("RGB24"))


def temporal_rgb24() -> Clip:
    """3-frame clip; frame n is the content shifted down n rows."""
    frames = [_rgb_image(n) for n in range(3)]
    u8 = np.clip(np.round(np.stack(frames) * 255.0), 0, 255).astype(np.uint8)
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
