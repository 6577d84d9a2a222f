"""Limiter: clamp planes to explicit or range-derived min/max.

Reference: src/vapoursynth/limiter.zig (glue/validation) and
src/filters/limiter.zig (the comptime range tables).  Three modes:

* explicit ``min``/``max`` arrays (both required, one entry per plane);
* ``tv_range=True``: TV-range tables — YUV gets 16..235 luma / 16..240
  chroma scaled by bit depth, RGB gets 16..235 on all planes; float YUV is
  0..1 luma / -0.5..0.5 chroma regardless of tv_range;
* default: full-range tables (0..2^bits-1 for ints).

``mask=True`` treats a YUV clip like RGB (full-range-style limits on
chroma).  The only filter besides PlaneAverage that accepts 32-bit ints.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import Clip
from ..core.format import ColorFamily, ColorRange, SampleType
from ..core.params import VSZipError, parse_planes

FILTER_NAME = "Limiter"


def _range_limits(fmt, yuv: bool, tv_range: bool, plane: int):
    """The comptime tables (reference src/filters/limiter.zig:66-91)."""
    if fmt.sample_type is SampleType.FLOAT:
        if yuv and plane > 0:
            return -0.5, 0.5
        return 0.0, 1.0
    bits = fmt.bits_per_sample
    if not tv_range:
        return 0, (1 << bits) - 1
    lo = 16 << (bits - 8)
    if yuv and plane > 0:
        return lo, 240 << (bits - 8)
    return lo, 235 << (bits - 8)


@partial(jax.jit, static_argnums=(1, 2))
def _clamp(x, lo, hi):
    lo = jnp.asarray(lo, dtype=x.dtype)
    hi = jnp.asarray(hi, dtype=x.dtype)
    return jnp.minimum(jnp.maximum(lo, x), hi)


def limiter(clip: Clip, min=None, max=None, tv_range: bool = False,
            mask: bool = False, planes=None) -> Clip:
    fmt = clip.format
    num_planes = fmt.num_planes
    process = parse_planes(planes, num_planes, FILTER_NAME)
    is_int = fmt.sample_type is SampleType.INTEGER
    peak = fmt.peak_value(False, ColorRange.FULL)

    has_min, has_max = min is not None, max is not None
    if has_min and not has_max:
        raise VSZipError(f"{FILTER_NAME}: min array is set but max array is not.")
    if has_max and not has_min:
        raise VSZipError(f"{FILTER_NAME}: max array is set but min array is not.")

    if has_min:
        # a bare scalar is a length-1 array (VS map semantics)
        min = [min] if not isinstance(min, (list, tuple)) else list(min)
        max = [max] if not isinstance(max, (list, tuple)) else list(max)
        if len(min) != num_planes:
            raise VSZipError(
                f"{FILTER_NAME}: min array must have the same number of elements as planes."
            )
        if len(max) != num_planes:
            raise VSZipError(
                f"{FILTER_NAME}: max array must have the same number of elements as planes."
            )
        mins, maxs = [], []
        for i in range(num_planes):
            if is_int:
                for nm, v in (("min", min[i]), ("max", max[i])):
                    if float(v) > peak:
                        raise VSZipError(
                            f"{FILTER_NAME}: {nm} value must be less than or equal to peak value."
                        )
                    if int(v) < 0:
                        raise VSZipError(
                            f"{FILTER_NAME}: {nm} value must be greater than or equal to 0."
                        )
                mins.append(int(min[i]))
                maxs.append(int(max[i]))
            else:
                mins.append(float(min[i]))
                maxs.append(float(max[i]))
            if mins[i] > maxs[i]:
                raise VSZipError(
                    f"{FILTER_NAME}: min value must be less than or equal to max value."
                )
    else:
        yuv = fmt.color_family is ColorFamily.YUV and not mask
        lims = [_range_limits(fmt, yuv, tv_range, p) for p in range(num_planes)]
        mins = [l[0] for l in lims]
        maxs = [l[1] for l in lims]

    out = []
    for p, x in enumerate(clip.planes):
        if not process[p]:
            out.append(x)
            continue
        out.append(_clamp(x, mins[p], maxs[p]))
    return clip.with_planes(out)
