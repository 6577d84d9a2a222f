"""AdaptiveBinarize: OpenCV-style adaptive threshold against a second clip.

Reference: src/vapoursynth/adaptive_binarize.zig — 8-bit integer only;
``dst = 255 if (src2 - src1 >= c) else 0`` on every plane (clip2 is
typically a blurred version of clip).  Sets ``_ColorRange`` FULL.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.clip import Clip
from ..core.format import SampleType
from ..core.params import compare_clips, require

FILTER_NAME = "AdaptiveBinarize"


@partial(jax.jit, static_argnums=(2,))
def _binarize(s1, s2, c: int):
    diff = s2.astype(jnp.int16) - s1.astype(jnp.int16)
    return jnp.where(diff >= jnp.int16(c), jnp.uint8(255), jnp.uint8(0))


def adaptive_binarize(clip: Clip, clip2: Clip, c: int = 3) -> Clip:
    fmt = clip.format
    compare_clips([clip, clip2], FILTER_NAME, same_len=False, bigger_than=True)
    require(
        fmt.sample_type is SampleType.INTEGER and fmt.bits_per_sample == 8,
        FILTER_NAME, "only 8 bit int format supported.",
    )
    # src2 - src1 ranges [-255, 255]; clamping keeps comparisons intact
    c = max(-256, min(256, int(c)))
    out = [
        _binarize(clip.planes[p], clip2.planes[p], c)
        for p in range(fmt.num_planes)
    ]
    return clip.with_planes(out).with_props(_ColorRange=0)
