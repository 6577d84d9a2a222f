"""BoxBlur: separable box blur with the reference's exact dual-path semantics.

Reference behavior being reproduced (NOT translated — the reference runs
sequential per-row running sums on CPU SIMD; here the identical arithmetic is
restated in closed form over prefix sums so it vectorizes on the TPU VPU):

* Runtime path (reference src/filters/boxblur_runtime.zig): H passes then V
  passes; every 1-D pass is a fixed-point running box sum for ints
  (``inv = (2^32+r)//ksize``, init ``(W0*inv + 2^31) >> 16``, per-step
  ``+/- pixel*inv2`` with ``inv2 = inv >> 16``, output ``sum >> 16``) and an
  f32 running mean for floats.  Edges mirror with duplication (numpy
  'symmetric').  The running state is affine in the window sum W(x):
  ``out(x) = (C0 + inv2*(W(x) - W(0))) >> 16`` with
  ``C0 = (W(0)*inv + 2^31) >> 16`` — bit-exact and fully parallel.
* Comptime path (reference src/filters/boxblur_comptime.zig, selected when
  hradius==vradius<=22 and 1 pass each): vertical FIRST as a raw column sum
  quantized via ``(col*inv + 2^31) >> 32``, then the horizontal fixed-point
  running pass.  Vertical edges use the reference's hybrid mirror
  (top: reflect-101 clamped to h-1; bottom: tap offset ``o`` reads absolute
  row ``max(h-1-o, 0)``); horizontal edges mirror with duplication.
  Float: direct FIR in both axes with the hybrid mirror on BOTH axes.

Float accumulation policy: the reference chains f32 adds sequentially; we
compute window sums via f64 prefix sums and narrow once (documented
deviation, accurate to ~1 ULP of the true mean, well inside the reference
test tolerances).  The comptime float path reproduces the reference's exact
f32 add ordering (an unrolled tap ladder), so f32 outputs are bit-exact there.

Dispatch rule replicated from reference src/vapoursynth/boxblur.zig:188:
``use_rt = hradius != vradius or hradius > 22 or hpasses > 1 or vpasses > 1``
(including the quirk that the comptime path ignores pass counts, so e.g.
hpasses=0 with hradius==vradius still blurs both axes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import Clip
from ..core.format import SampleType
from ..core.params import VSZipError, parse_planes, require

FILTER_NAME = "BoxBlur"


# ---------------------------------------------------------------------------
# mirror index tables (host-side, static per (n, radius))
# ---------------------------------------------------------------------------

def _symmetric_idx(n: int, off: int) -> np.ndarray:
    """Duplicate-edge mirror ('symmetric'): m(-j)=j-1, m(n-1+j)=n-j."""
    idx = np.arange(n) + off
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx > n - 1, 2 * n - 1 - idx, idx)
    return np.clip(idx, 0, n - 1)


def _hybrid_idx(n: int, off: int) -> np.ndarray:
    """The comptime path's mirror (reference mirrorRows,
    src/filters/boxblur_comptime.zig:50-70, and hBlurFloat edges):
    j<0 -> min(-j, n-1); j>n-1 -> max(n-1-off, 0)."""
    idx = np.arange(n) + off
    idx = np.where(idx < 0, np.minimum(-idx, n - 1), idx)
    idx = np.where(idx > n - 1, max(n - 1 - off, 0), idx)
    return idx


def _window_sums(x, radius: int, axis: int, acc_dtype):
    """Sliding window sums of width 2r+1 with duplicate-edge mirror, via an
    exclusive prefix sum over the padded axis."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x.astype(acc_dtype), pad, mode="symmetric")
    cs = jnp.cumsum(xp, axis=axis)
    ksize = 2 * radius + 1
    hi = jax.lax.slice_in_dim(cs, ksize - 1, ksize - 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(cs, 0, n, axis=axis) - jax.lax.slice_in_dim(
        xp, 0, n, axis=axis
    )
    return hi - lo


# ---------------------------------------------------------------------------
# runtime-path 1-D passes (closed form of the running sums)
# ---------------------------------------------------------------------------

def _blur_int_rt_1d(x, radius: int, axis: int):
    """One integer running-sum pass, bit-exact (int64 arithmetic)."""
    ksize = 2 * radius + 1
    inv = ((1 << 32) + radius) // ksize
    inv2 = inv >> 16
    w = _window_sums(x, radius, axis, jnp.int64)
    w0 = jax.lax.slice_in_dim(w, 0, 1, axis=axis)
    c0 = (w0 * inv + (1 << 31)) >> 16
    return ((c0 + inv2 * (w - w0)) >> 16).astype(x.dtype)


def _blur_float_rt_1d(x, radius: int, axis: int):
    """One float running-mean pass; f64 prefix accumulation, narrowed once."""
    div = np.float64(1.0) / np.float32(2 * radius + 1)
    w = _window_sums(x, radius, axis, jnp.float64)
    return (w * div).astype(x.dtype)


def _rt_blur(x, hradius: int, hpasses: int, vradius: int, vpasses: int,
             is_int: bool):
    blur1d = _blur_int_rt_1d if is_int else _blur_float_rt_1d
    if hradius > 0:
        for _ in range(max(hpasses, 0)):
            x = blur1d(x, hradius, axis=2)
    if vradius > 0:
        for _ in range(max(vpasses, 0)):
            x = blur1d(x, vradius, axis=1)
    return x


# ---------------------------------------------------------------------------
# comptime path (hradius == vradius <= 22, single pass)
# ---------------------------------------------------------------------------

def _taps_hybrid(x, radius: int, axis: int):
    """Stack of 2r+1 tap views with the comptime path's hybrid mirror."""
    n = x.shape[axis]
    for off in range(-radius, radius + 1):
        yield jnp.take(x, jnp.asarray(_hybrid_idx(n, off)), axis=axis)


def _ct_blur_int(x, radius: int):
    inv = ((1 << 32) + radius) // (2 * radius + 1)
    # vertical: raw column sums (hybrid mirror), quantized at 32-bit shift
    col = None
    for tap in _taps_hybrid(x.astype(jnp.int64), radius, axis=1):
        col = tap if col is None else col + tap
    tmp = ((col * inv + (1 << 31)) >> 32).astype(x.dtype)
    # horizontal: the same running fixed-point pass as the runtime path
    return _blur_int_rt_1d(tmp, radius, axis=2)


def _ct_blur_float(x, radius: int):
    # Reference accumulates acc += div * tap in f32, tap order k=0..ksize-1,
    # in BOTH axes (vBlurFloat then hBlurFloat) — replicate the exact ladder.
    div = jnp.float32(1.0 / (2 * radius + 1))
    xf = x.astype(jnp.float32)
    acc = None
    for tap in _taps_hybrid(xf, radius, axis=1):
        term = div * tap
        acc = term if acc is None else acc + term
    tmp = acc.astype(x.dtype).astype(jnp.float32)  # f16 narrows between axes
    acc = None
    for tap in _taps_hybrid(tmp, radius, axis=2):
        term = div * tap
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _boxblur_plane(x, use_rt: bool, hradius: int, hpasses: int, vradius: int,
                   vpasses: int, is_int: bool):
    if use_rt:
        return _rt_blur(x, hradius, hpasses, vradius, vpasses, is_int)
    if is_int:
        return _ct_blur_int(x, hradius)
    return _ct_blur_float(x, hradius)


def boxblur(clip: Clip, planes=None, hradius: int = 1, hpasses: int = 1,
            vradius: int = 1, vpasses: int = 1) -> Clip:
    """vszip.BoxBlur equivalent (reference src/vapoursynth/boxblur.zig:131)."""
    fmt = clip.format
    require(
        not (fmt.sample_type is SampleType.INTEGER and fmt.bits_per_sample == 32),
        FILTER_NAME, "not supported Int format.",
    )
    process = parse_planes(planes, fmt.num_planes, FILTER_NAME)
    hradius, vradius = int(hradius), int(vradius)
    hpasses, vpasses = int(hpasses), int(vpasses)
    require(hradius >= 0 and vradius >= 0, FILTER_NAME, "radius must be >= 0")

    vb = vradius > 0 and vpasses > 0
    hb = hradius > 0 and hpasses > 0
    require(vb or hb, FILTER_NAME, "nothing to be performed")

    for p in range(fmt.num_planes):
        if not process[p]:
            continue
        pw, ph = clip.plane_dims(p)
        if hb and 2 * hradius >= pw:
            raise VSZipError(
                f"{FILTER_NAME}: hradius too large; 2*hradius must be < the "
                "(smallest processed) plane width."
            )
        if vb and 2 * vradius >= ph:
            raise VSZipError(
                f"{FILTER_NAME}: vradius too large; 2*vradius must be < the "
                "(smallest processed) plane height."
            )

    use_rt = (hradius != vradius) or (hradius > 22) or (hpasses > 1) or (vpasses > 1)
    is_int = fmt.sample_type is SampleType.INTEGER

    out = []
    for p, x in enumerate(clip.planes):
        if not process[p]:
            out.append(x)
            continue
        out.append(
            _boxblur_plane(x, use_rt, hradius, hpasses, vradius, vpasses, is_int)
        )
    return clip.with_planes(out)
