"""Fused Pallas TPU kernel for CombMask.

Reference: src/filters/comb_mask.zig (both metrics, motion mask, expand).
Like the Checkmate kernel, one grid step loads a 64-row band plus +-2-row
halos (and the clamped previous frame for the motion mask) and computes the
whole mask in VMEM; the jnp path materialized a shifted full-plane view per
tap.  The reflect-101 top/bottom rows are patched with global-row selects
(row 0's up-tap is row 1, etc.), reproducing the reference mirror exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 64
HALO = 8


def _slab(band_ref, top_ref, bot_ref):
    return jnp.concatenate(
        [top_ref[0, HALO - 2 :].astype(jnp.int32),
         band_ref[0].astype(jnp.int32),
         bot_ref[0, :2].astype(jnp.int32)], axis=0)


def _expand_row(m):
    """3-tap horizontal dilation with the reference quirks: column 0 takes
    m[0]|m[1], the last column keeps its pre-expand value."""
    w = m.shape[1]
    left = jnp.concatenate([m[:, :1], m[:, :-1]], axis=1)
    right = jnp.concatenate([m[:, 1:], m[:, -1:]], axis=1)
    out = left | m | right
    col = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    out = jnp.where(col == jnp.int32(0), m | right, out)
    return jnp.where(col == jnp.int32(w - 1), m, out)


def _comb_mask_kernel(refs, o_ref, *, h: int, w: int, cthresh: int,
                      cth6: int, mthresh: int, metric_1: bool, expand: bool):
    motion = mthresh > 0
    if motion:
        xb, xt, xbo, pb, pt, pbo = refs
    else:
        xb, xt, xbo = refs
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, w), 0) + j * jnp.int32(B)

    sx = _slab(xb, xt, xbo)
    c = sx[2:-2]
    up = sx[1:-3]
    dn = sx[3:-1]
    # reflect-101 at the picture edges: row 0's up is row 1, row h-1's down
    # is row h-2 (and the +-2 taps likewise)
    first = rows == jnp.int32(0)
    last = rows == jnp.int32(h - 1)
    upf = jnp.where(first, dn, up)
    dnf = jnp.where(last, up, dn)
    ct = jnp.int32(cthresh)
    if metric_1:
        mask = jnp.where((upf - c) * (dnf - c) > ct, jnp.int32(255),
                         jnp.int32(0))
    else:
        up2 = sx[:-4]
        dn2 = sx[4:]
        second = rows == jnp.int32(1)
        len2 = rows == jnp.int32(h - 2)
        up2f = jnp.where(first, dn2, jnp.where(second, c, up2))
        dn2f = jnp.where(last, up2, jnp.where(len2, c, dn2))
        d1 = c - upf
        d2 = c - dnf
        pred = ((d1 > ct) & (d2 > ct)) | ((d1 < -ct) & (d2 < -ct))
        val = jnp.abs((up2f + jnp.int32(4) * c + dn2f)
                      - jnp.int32(3) * (upf + dnf)) > jnp.int32(cth6)
        mask = jnp.where(pred & val, jnp.int32(255), jnp.int32(0))

    if expand and not motion:
        mask = _expand_row(mask)
    if motion:
        sp = _slab(pb, pt, pbo)
        dsl = jnp.abs(sx[1:-1] - sp[1:-1])  # rows y-1 .. y+B
        dmask = jnp.where(dsl > jnp.int32(mthresh), jnp.int32(255),
                          jnp.int32(0))
        du = dmask[:-2]
        dd = dmask[1:-1]
        dnn = dmask[2:]
        du = jnp.where(first, jnp.int32(0), du)   # zero row above the top
        dnn = jnp.where(last, dd, dnn)            # clamped at the bottom
        mask = mask & (du | dd | dnn)
        if expand:
            mask = _expand_row(mask)

    o_ref[0] = mask.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def comb_mask_pallas(x, cthresh: int, cth6: int, mthresh: int,
                     metric_1: bool, expand: bool):
    """x: (N, H, W) uint8; the previous frame arrives via a clamped frame
    index map (frame 0 compares with itself -> zero motion diff)."""
    n, h, w = x.shape
    nbh = -(h // -B)
    rows = nbh * B + HALO
    xp = x
    if xp.shape[1] < rows:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n, rows - xp.shape[1], w), x.dtype)], axis=1)
    qmax = np.int32((xp.shape[1] - 1) // HALO)
    zero = np.int32(0)
    q = np.int32(B // HALO)

    def band(prev):
        if prev:
            fi = lambda i: jnp.maximum(i - np.int32(1), zero)
        else:
            fi = lambda i: i
        return pl.BlockSpec((1, B, w), lambda i, j, fi=fi: (fi(i), j, zero),
                            memory_space=pltpu.VMEM)

    def top(prev):
        fi = (lambda i: jnp.maximum(i - np.int32(1), zero)) if prev else (
            lambda i: i)
        return pl.BlockSpec(
            (1, HALO, w),
            lambda i, j, fi=fi: (fi(i),
                                 jnp.maximum(j * q - np.int32(1), zero), zero),
            memory_space=pltpu.VMEM)

    def bot(prev):
        fi = (lambda i: jnp.maximum(i - np.int32(1), zero)) if prev else (
            lambda i: i)
        return pl.BlockSpec(
            (1, HALO, w),
            lambda i, j, fi=fi: (fi(i),
                                 jnp.minimum((j + np.int32(1)) * q, qmax),
                                 zero),
            memory_space=pltpu.VMEM)

    motion = mthresh > 0
    specs = [band(False), top(False), bot(False)]
    args = [xp, xp, xp]
    if motion:
        specs += [band(True), top(True), bot(True)]
        args += [xp, xp, xp]

    kern = functools.partial(
        _comb_mask_kernel, h=h, w=w, cthresh=cthresh, cth6=cth6,
        mthresh=mthresh, metric_1=metric_1, expand=expand)

    def wrap(*all_refs):
        kern(all_refs[:-1], all_refs[-1])

    out = pl.pallas_call(
        wrap,
        out_shape=jax.ShapeDtypeStruct((n, nbh * B, w), x.dtype),
        grid=(n, nbh),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, B, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
    )(*args)
    return out[:, :h]
