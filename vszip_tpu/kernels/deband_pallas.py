"""Fused Pallas TPU band kernel for Deband's separable sample modes.

Reference: src/filters/deband_int.zig:93-340 (per-pixel kernels) +
src/vapoursynth/deband.zig:230-280 (ref-offset generation).  Every sample
mode except 2 draws its refs along one axis from a single per-pixel
magnitude ``val1`` bounded by ``min(range, edge distances)``: m1 rows,
m3 columns, m4-m7 rows for ref1 and columns for ref2.  The XLA select
chain resolves those taps gather-free but re-reads the padded plane per
masked select; this kernel keeps a (B + 2*HALO)-row slab in VMEM and runs
the whole alphabet loop plus the mode arithmetic in one grid step.

Offset resolution: a ``fori_loop`` over the alphabet ``a = 1..rmax``
(compile-time-friendly, per the large-unroll Mosaic cost) selects
* row taps from dynamic sublane slices of the VMEM slab, and
* column taps from two incrementally ``pltpu.roll``-ed copies of the
  center band (shift 1 per iteration; wrapped lanes are never selected
  because ``val1 <= min(x, w-1-x)`` by construction).

Edge rows need no special casing for the same reason (``val1 <= min(y,
h-1-y)``), so the clamped top/bottom halo blocks' garbage is never
selected — unlike Checkmate there is no pass-through band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.deband import _mode_center

B = 64
HALO = 16


def _deband_band_kernel(vb, xb, xt, xbo, o_ref, slab, *, mode: int,
                        blur_first: bool, rmax: int, thr3):
    thr, thr1, thr2 = thr3
    # blocks arrive as i32: Mosaic cannot lower 16-bit<->32-bit integer
    # converts in-kernel, so the XLA caller widens before the pallas_call
    slab[:HALO] = xt[0]
    slab[HALO : HALO + B] = xb[0]
    slab[HALO + B :] = xbo[0]
    full = slab[...]
    c = full[HALO : HALO + B]
    v = vb[...]
    use_rows = mode != 3
    use_cols = mode != 1

    def body(_, carry):
        # the fori induction var is i64 under jax_enable_x64 and Mosaic has
        # no i64 lowering at all — carry our own i32 counter instead
        r1, r3, r2, r4, su, sd, cp, cm, a = carry
        m = v == a
        if use_rows:
            # su/sd are the slab rolled incrementally by +-a sublanes
            # (pltpu.roll wants non-negative shifts; -1 == n-1 circularly);
            # row taps read a static window of the rolled value.  Dynamic
            # sublane ref slices inside fori bodies fail Mosaic compile.
            su = pltpu.roll(su, jnp.int32(su.shape[0] - 1), 0)
            sd = pltpu.roll(sd, jnp.int32(1), 0)
            r1 = jnp.where(m, su[HALO : HALO + B], r1)
            r3 = jnp.where(m, sd[HALO : HALO + B], r3)
        if use_cols:
            cp = pltpu.roll(cp, jnp.int32(cp.shape[1] - 1), 1)
            cm = pltpu.roll(cm, jnp.int32(1), 1)
            r2 = jnp.where(m, cp, r2)
            r4 = jnp.where(m, cm, r4)
        return r1, r3, r2, r4, su, sd, cp, cm, a + jnp.int32(1)

    r1, r3, r2, r4, *_ = jax.lax.fori_loop(
        0, rmax, body, (c, c, c, c, full, full, c, c, jnp.int32(1)))
    if mode == 3:
        r1, r3 = r2, r4
    center = _mode_center(
        mode, blur_first, True, c, r1, r3, r2, r4, thr, thr1, thr2)
    o_ref[0] = center.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def deband_center_pallas(x, vmap, mode: int, blur_first: bool, rmax: int,
                         thr3):
    """x: (N, H, W) uint16 (internal depth); vmap: (H, W) int32 val1 plane.
    Returns the mode's pre-grain center as (N, H, W) int32."""
    n, h, w = x.shape
    nbh = -(h // -B)
    rows = nbh * B + HALO
    xp = x.astype(jnp.int32)
    if xp.shape[1] < rows:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n, rows - xp.shape[1], w), jnp.int32)], axis=1)
    vp = vmap
    if vp.shape[0] < nbh * B:
        vp = jnp.concatenate(
            [vp, jnp.zeros((nbh * B - vp.shape[0], w), vmap.dtype)], axis=0)
    qmax = np.int32((xp.shape[1] - 1) // HALO)
    zero = np.int32(0)
    q = np.int32(B // HALO)

    specs = [
        pl.BlockSpec((B, w), lambda i, j: (j, zero), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, w), lambda i, j: (i, j, zero),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, HALO, w),
            lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, HALO, w),
            lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmax), zero),
            memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(
        _deband_band_kernel, mode=mode, blur_first=blur_first, rmax=rmax,
        thr3=thr3)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nbh * B, w), jnp.int32),
        grid=(n, nbh),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, B, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B + 2 * HALO, w), jnp.int32)],
    )(vp, xp, xp, xp)
    return out[:, :h]
