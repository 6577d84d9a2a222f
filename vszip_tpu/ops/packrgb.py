"""PackRGB: planar RGB -> interleaved single-plane u32.

Reference: src/vapoursynth/packrgb.zig.  RGB24 packs to BGRA bytes (alpha
255): as a little-endian u32 that is ``B | G<<8 | R<<16 | 0xFF000000``.
RGB30 packs to 10:10:10:2: ``B | G<<10 | R<<20 | 0b11<<30``.  Output is a
GRAY32 (u32) clip of the same dimensions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.clip import Clip
from ..core.format import ColorFamily, SampleType, VideoFormat, get_format
from ..core.params import require

FILTER_NAME = "PackRGB"


@partial(jax.jit, static_argnums=(3,))
def _pack(r, g, b, is_rgb24: bool):
    r32 = r.astype(jnp.uint32)
    g32 = g.astype(jnp.uint32)
    b32 = b.astype(jnp.uint32)
    if is_rgb24:
        return b32 | (g32 << 8) | (r32 << 16) | jnp.uint32(0xFF000000)
    return b32 | (g32 << 10) | (r32 << 20) | jnp.uint32(0b11 << 30)


def packrgb(clip: Clip) -> Clip:
    fmt = clip.format
    is_rgb24 = fmt.name == "RGB24"
    require(
        fmt.name in ("RGB24", "RGB30"),
        FILTER_NAME, "only RGB24 and RGB30 inputs are supported!",
    )
    r, g, b = clip.planes
    packed = _pack(r, g, b, is_rgb24)
    return Clip((packed,), get_format("GRAY32"), dict(clip.props))
