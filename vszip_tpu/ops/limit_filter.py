"""LimitFilter: mvsfunc-style soft limiter between a filtered and source clip.

Reference: src/filters/limit_filter.zig (per-pixel f32 ramp) and
src/vapoursynth/limit_filter.zig (glue; thresholds given at 8-bit scale and
scaled to the clip depth via scaleValue).  Per pixel:

    diff = flt - ref;  thr1 = bright_thr if diff > 0 else dark_thr
    thr2 = thr1 * elast
    |diff| <= thr1 -> flt
    |diff| >= thr2 -> src
    else          -> src + (flt - src) * (thr2 - |diff|) / (thr2 - thr1)

Integer outputs round half-up (``trunc(out + 0.5)``).  Unprocessed planes
pass through from the *flt* clip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.clip import Clip
from ..core.format import SampleType
from ..core.params import (
    VSZipError,
    compare_clips,
    get_array,
    parse_planes,
    require,
    scale_value,
)

FILTER_NAME = "LimitFilter"


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _limit_plane(f, s, r, dark_thr: float, bright_thr: float, elast: float,
                 is_int: bool):
    ff = f.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    diff = ff - rf
    diff_abs = jnp.abs(diff)
    thr1 = jnp.where(diff > 0, jnp.float32(bright_thr), jnp.float32(dark_thr))
    thr2 = thr1 * jnp.float32(elast)
    ramp = sf + (ff - sf) * (thr2 - diff_abs) / (thr2 - thr1)
    out = jnp.where(diff_abs <= thr1, ff, jnp.where(diff_abs >= thr2, sf, ramp))
    if is_int:
        out = jnp.trunc(out + jnp.float32(0.5))
    return out.astype(f.dtype)


def limit_filter(flt: Clip, src: Clip, ref: Clip | None = None, dark_thr=None,
                 bright_thr=None, elast=None, planes=None) -> Clip:
    fmt = flt.format
    require(
        not (fmt.sample_type is SampleType.INTEGER and fmt.bits_per_sample == 32),
        FILTER_NAME, "not supported Int format.",
    )
    clips = [flt, src] + ([ref] if ref is not None else [])
    compare_clips(clips, FILTER_NAME, same_len=True)
    process = parse_planes(planes, fmt.num_planes, FILTER_NAME)
    dark = get_array(dark_thr, "dark_thr", 1.0, 0.0, 255.0, FILTER_NAME)
    bright = get_array(bright_thr, "bright_thr", 1.0, 0.0, 255.0, FILTER_NAME)
    elast_a = get_array(elast, "elast", 2.0, 0.0, 65535.0, FILTER_NAME)
    # Thresholds are at 8-bit scale (reference src/vapoursynth/
    # limit_filter.zig:106-110).  Color range: FULL, unconditionally — pinned
    # empirically against the reference's goldens/limitfilter.json: the
    # full-range ratio (e.g. x65535/255 at 16-bit) reproduces every pinned
    # avg EXACTLY on GRAY16/YUV420P16/GRAYS fixtures, while the nominal
    # limited-range x256 misses asymmetric-threshold cases by ~1e-4.
    from ..core.format import ColorRange

    dark = [scale_value(v, flt, color_range=ColorRange.FULL) for v in dark]
    bright = [scale_value(v, flt, color_range=ColorRange.FULL) for v in bright]

    is_int = fmt.sample_type is SampleType.INTEGER
    rclip = ref if ref is not None else src
    out = []
    for p in range(fmt.num_planes):
        if not process[p]:
            out.append(flt.planes[p])
            continue
        out.append(
            _limit_plane(flt.planes[p], src.planes[p], rclip.planes[p],
                         float(dark[p]), float(bright[p]), float(elast_a[p]),
                         is_int)
        )
    return flt.with_planes(out)
