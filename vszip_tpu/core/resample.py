"""Format conversion utilities (the rebuild's analogue of the reference's
Resize-plugin invocations: ``toRGBS`` in src/helper.zig:225-243 and
``sRGBtoLinearRGB`` in src/vapoursynth/ssimulacra2.zig:132-162).

The reference delegates to zimg's Bicubic resampler; here YUV->RGB uses the
exact BT.709/601 limited-range matrix with bilinear chroma upsampling — a
documented deviation (goldens in this repo pin these semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from .clip import Clip
from .format import ColorFamily, SampleType, get_format

# matrix coefficients: (Kr, Kb)
_MATRICES = {1: (0.2126, 0.0722), 6: (0.299, 0.114)}  # 709, 601


def _plane_to_float(x, fmt, chroma: bool):
    if fmt.sample_type is SampleType.FLOAT:
        return x.astype(jnp.float32)
    bits = fmt.bits_per_sample
    lo = (16 << (bits - 8))
    if chroma:
        return (x.astype(jnp.float32) - (128 << (bits - 8))) / (224 << (bits - 8))
    return (x.astype(jnp.float32) - lo) / (219 << (bits - 8))


def _upsample_chroma(c, ssw: int, ssh: int, w: int, h: int):
    """Bilinear co-sited upsample of a chroma plane to luma dims."""
    if ssw == 0 and ssh == 0:
        return c
    # nearest+average bilinear: repeat then average neighbors (MPEG-style
    # left-aligned siting approximated by simple bilinear between samples)
    for axis, factor in ((1, 1 << ssh), (2, 1 << ssw)):
        if factor == 1:
            continue
        n = c.shape[axis]
        up = jnp.repeat(c, factor, axis=axis)
        shifted = jnp.roll(up, -1, axis=axis)
        # average adjacent repeated samples for the in-between positions
        idx = jnp.arange(n * factor) % factor
        frac = (idx.astype(jnp.float32) / factor).reshape(
            [1, -1, 1] if axis == 1 else [1, 1, -1]
        )
        up = up * (1 - frac) + shifted * frac
        c = up
    return c[:, :h, :w]


def to_rgbs(clip: Clip) -> Clip:
    """YUV/Gray/RGB -> RGBS (reference toRGBS: matrix 709 when height > 650
    else 601, limited-range YUV assumed)."""
    fmt = clip.format
    if fmt.color_family is ColorFamily.RGB:
        if fmt.sample_type is SampleType.FLOAT and fmt.bits_per_sample == 32:
            return clip
        peak = (1 << fmt.bits_per_sample) - 1
        planes = tuple(
            (p.astype(jnp.float32) / peak) for p in clip.planes
        )
        return Clip(planes, get_format("RGBS"), dict(clip.props))

    matrix = 1 if clip.height > 650 else 6
    kr, kb = _MATRICES[matrix]
    kg = 1.0 - kr - kb
    w, h = clip.width, clip.height
    y = _plane_to_float(clip.planes[0], fmt, False)
    if fmt.color_family is ColorFamily.GRAY:
        planes = (y, y, y)
    else:
        cb = _upsample_chroma(
            _plane_to_float(clip.planes[1], fmt, True),
            fmt.subsampling_w, fmt.subsampling_h, w, h,
        )
        cr = _upsample_chroma(
            _plane_to_float(clip.planes[2], fmt, True),
            fmt.subsampling_w, fmt.subsampling_h, w, h,
        )
        r = y + 2.0 * (1.0 - kr) * cr
        b = y + 2.0 * (1.0 - kb) * cb
        g = (y - kr * r - kb * b) / kg
        planes = (r, g, b)
    planes = tuple(p.astype(jnp.float32) for p in planes)
    return Clip(planes, get_format("RGBS"), dict(clip.props))


def srgb_to_linear(clip: Clip) -> Clip:
    """IEC 61966-2-1 EOTF on an RGBS clip (skipped when the clip already
    carries _Transfer=LINEAR, like the reference's prop check)."""
    if clip.props.get("_Transfer") == 8:  # LINEAR
        return clip

    def lin(v):
        v = v.astype(jnp.float32)
        return jnp.where(
            v <= 0.04045,
            v / 12.92,
            jnp.power((v + 0.055) / 1.055, 2.4),
        )

    planes = tuple(lin(p) for p in clip.planes)
    return Clip(planes, clip.format, {**clip.props, "_Transfer": 8})
