"""CombMaskMT: MTCombMask-style vertical comb detector.

Reference: src/filters/comb_mask_mt.zig + src/vapoursynth/comb_mask_mt.zig.
Per plane (all planes, 8-bit only): ``prod = (up - c) * (down - c)``; output
255/0 binary when thY1 == thY2, else a ramp
``min((prod - thY1) * 256 / (thY2 - thY1), 255)`` clamped by the two
thresholds.  First and last rows are 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.clip import Clip
from ..core.format import SampleType
from ..core.params import VSZipError, require

FILTER_NAME = "CombMaskMT"


@partial(jax.jit, static_argnums=(1, 2))
def _comb_mask_mt_plane(x, thy1: int, thy2: int):
    xi = x.astype(jnp.int32)
    up = xi[:, :-2, :]
    c = xi[:, 1:-1, :]
    down = xi[:, 2:, :]
    prod = (up - c) * (down - c)
    if thy1 == thy2:
        mid = jnp.where(prod > thy2, jnp.uint8(255), jnp.uint8(0))
    else:
        gray = jnp.minimum((prod - thy1) * 256 // (thy2 - thy1), 255)
        val = jnp.where(prod < thy1, 0, jnp.where(prod > thy2, 255, gray))
        mid = val.astype(jnp.uint8)
    zrow = jnp.zeros_like(mid[:, :1, :])
    return jnp.concatenate([zrow, mid, zrow], axis=1)


def comb_mask_mt(clip: Clip, thY1: int = 30, thY2: int = 30) -> Clip:
    fmt = clip.format
    require(
        fmt.sample_type is SampleType.INTEGER and fmt.bits_per_sample == 8,
        FILTER_NAME, "only 8 bit int format supported.",
    )
    thY1, thY2 = int(thY1), int(thY2)
    if thY1 > 255 or thY1 < 0:
        raise VSZipError(f"{FILTER_NAME}: thY1 value should be in range [0;255]")
    if thY2 > 255 or thY2 < 0:
        raise VSZipError(f"{FILTER_NAME}: thY2 value should be in range [0;255]")
    if thY1 > thY2:
        raise VSZipError(f"{FILTER_NAME}: thY1 can't be greater than thY2")
    min_h = clip.height >> fmt.subsampling_h
    if min_h < 3:
        raise VSZipError(
            f"{FILTER_NAME}: clip too small; every plane must be at least 3 rows tall."
        )
    out = [_comb_mask_mt_plane(p, thY1, thY2) for p in clip.planes]
    return clip.with_planes(out)
