"""Fused Pallas TPU kernel for Checkmate.

Reference: src/filters/checkmate.zig (temporal+spatial dot-crawl reducer).
The jnp path materializes ~10 shifted full-plane views per call; here one
grid step loads a 64-row band of the current frame plus its clamped
temporal neighbors (frame shifts become clamped block index maps, exactly
reproducing the reference's clip-end clamping) and the +-2-row halos, and
computes everything in VMEM.

The truncating division by 10 runs as f32 ``trunc(v / 10)``: for integer v
the fractional part of v/10 is at least 0.1, so the correctly-rounded f32
quotient can never cross an integer boundary — bit-exact to @divTrunc for
|v| < 2^24.
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


def _shc(a, off: int):
    """columns shifted by `off` with clamp-to-edge (reference x_left/x_right)."""
    if off < 0:
        lead = a[:, :1]
        parts = [lead] * (-off) + [a[:, :off]]
    else:
        tail = a[:, -1:]
        parts = [a[:, off:]] + [tail] * off
    return jnp.concatenate(parts, axis=1)


def _slab(band_ref, top_ref, bot_ref):
    """(B+4, w) i32 rows [y-2, y+B+2) of the plane in global coordinates."""
    return jnp.concatenate(
        [top_ref[0, HALO - 2 :].astype(jnp.int32),
         band_ref[0].astype(jnp.int32),
         bot_ref[0, :2].astype(jnp.int32)], axis=0)


def _col121(s):
    """s[y-2] + 2*s[y] + s[y+2] for the B output rows of a (B+4, w) slab."""
    return s[:-4] + jnp.int32(2) * s[2:-2] + s[4:]


def _checkmate_kernel(refs, o_ref, *, h: int, w: int, thr: int, tmax: int,
                      tthr2: int, use_tthr2: bool):
    if use_tthr2:
        (xb, xt, xbo, p1b, p1t, p1bo, n1b, n1t, n1bo, p2b, n2b) = refs
    else:
        (xb, xt, xbo, p1b, p1t, p1bo, n1b, n1t, n1bo) = refs
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, w), 0) + j * jnp.int32(B)

    sx = _slab(xb, xt, xbo)
    sp = _slab(p1b, p1t, p1bo)
    sn = _slab(n1b, n1t, n1bo)
    c = sx[2:-2]
    cp1 = sp[2:-2]
    cn1 = sn[2:-2]

    cur_col = _col121(sx)
    up = sx[:-4]
    down = sx[4:]
    curr_value = (
        -_shc(up, -2) - _shc(up, 2) + jnp.int32(2) * (_shc(c, -2) + _shc(c, 2))
        - _shc(down, -2) - _shc(down, 2)
        + jnp.int32(2) * cur_col + jnp.int32(12) * c
    )

    nc = jnp.int32(thr + tmax) - jnp.abs(_col121(sn) - cur_col)
    pc = jnp.int32(thr + tmax) - jnp.abs(_col121(sp) - cur_col)
    tmax_mult = jnp.int32((1 << 13) // tmax)
    zero = jnp.int32(0)
    tcap = jnp.int32(tmax + 1)
    cap = jnp.int32(8192)
    nw = jnp.minimum(jnp.clip(nc, zero, tcap) * tmax_mult, cap)
    pw = jnp.minimum(jnp.clip(pc, zero, tcap) * tmax_mult, cap)
    cw = jnp.int32(1 << 14) - (nw + pw)
    curr_div10 = jnp.trunc(
        curr_value.astype(jnp.float32) / jnp.float32(10.0)).astype(jnp.int32)
    out = (cw * curr_div10 + pw * (c + cp1) + nw * (c + cn1)) >> jnp.int32(15)
    out = jnp.clip(out, zero, jnp.int32(255))

    if use_tthr2:
        p2 = p2b[0].astype(jnp.int32)
        n2 = n2b[0].astype(jnp.int32)
        t2 = jnp.int32(tthr2)
        cond = (
            (jnp.abs(cp1 - cn1) < t2)
            & (jnp.abs(p2 - c) < t2)
            & (jnp.abs(c - n2) < t2)
        )
        out = jnp.where(cond, (cp1 + jnp.int32(2) * c + cn1) >> jnp.int32(2),
                        out)

    # first/last two picture rows pass through
    keep = (rows >= jnp.int32(2)) & (rows < jnp.int32(h - 2))
    res = jnp.where(keep, out, c)
    o_ref[0] = res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def checkmate_pallas(x, thr: int, tmax: int, tthr2: int, use_tthr2: bool):
    """x: (N, H, W) uint8.  Frame shifts clamp at the clip ends (index
    maps), matching the reference's boundary requests."""
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
    nmax = np.int32(n - 1)

    def fclamp(off):
        if off == 0:
            return lambda i, j: i
        if off < 0:
            return lambda i, j: jnp.maximum(i + np.int32(off), zero)
        return lambda i, j: jnp.minimum(i + np.int32(off), nmax)

    def band(off):
        fi = fclamp(off)
        return pl.BlockSpec((1, B, w), lambda i, j, fi=fi: (fi(i, j), j, zero),
                            memory_space=pltpu.VMEM)

    def top(off):
        fi = fclamp(off)
        return pl.BlockSpec(
            (1, HALO, w),
            lambda i, j, fi=fi: (fi(i, j),
                                 jnp.maximum(j * q - np.int32(1), zero), zero),
            memory_space=pltpu.VMEM)

    def bot(off):
        fi = fclamp(off)
        return pl.BlockSpec(
            (1, HALO, w),
            lambda i, j, fi=fi: (fi(i, j),
                                 jnp.minimum((j + np.int32(1)) * q, qmax),
                                 zero),
            memory_space=pltpu.VMEM)

    specs = [band(0), top(0), bot(0), band(-1), top(-1), bot(-1),
             band(1), top(1), bot(1)]
    args = [xp] * 9
    if use_tthr2:
        specs += [band(-2), band(2)]
        args += [xp, xp]

    kern = functools.partial(
        _checkmate_kernel, h=h, w=w, thr=thr, tmax=tmax, tthr2=tthr2,
        use_tthr2=use_tthr2)

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
