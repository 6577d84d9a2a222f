"""Fused Pallas TPU kernels for XPSNR's per-block statistics.

Reference: src/filters/xpsnr.zig:214-347 (block SSE + spatial/temporal
activity).  The jnp formulation computed three full-plane maps with
shifted-slice stencils and reduced them with zero-padded reshapes — every
shifted view and reshape is a full-plane relayout in XLA.  Here one grid
step loads a 64-row band (plus an 8-row halo for the 3x3 Laplacian),
computes diff^2 / |laplacian| / |temporal diff| in VMEM, and emits the
per-block sums directly.

Exactness: maps are i32; row sums within a band are i32 (<= 2^28); the
64-lane block reduction splits the column sums into 12-bit limbs and
contracts each against a block-indicator f32 matmul (partials <= 2^22,
f32-exact).  The limbs are emitted separately and recombined in f64 by
the caller, so every block sum stays an exact integer end to end (they
reach 2^32, beyond f32's exact range).

Covers the b=64, b_val=1 regime (HD-class frames, the benchmark case);
other geometries keep the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 64          # luma block size handled by this kernel
HALO = 8        # sublane-aligned row halo for the Laplacian


def _indicator(w: int, bx: int, nbw_pad: int) -> np.ndarray:
    """(w, nbw_pad) f32 block-membership matrix (column j -> block j//bx)."""
    ind = np.zeros((w, nbw_pad), np.float32)
    ind[np.arange(w), np.arange(w) // bx] = 1.0
    return ind


def _block_reduce(m, ind):
    """Exact per-block limb sums of an i32 band map: i32 row reduce, then a
    12-bit-limb split contracted against the f32 indicator (partials stay
    < 2^24, so f32 is exact).  Returns ((1, npw) hi, (1, npw) lo)."""
    cols = jnp.sum(m, axis=0, dtype=jnp.int32)[None, :]  # (1, w) <= 2^28
    hi = (cols >> jnp.int32(12)).astype(jnp.float32)
    lo = (cols & jnp.int32(4095)).astype(jnp.float32)
    # HIGHEST precision keeps the f32 operands un-truncated (the default
    # lowers f32 matmuls to one bf16 pass, which rounds the 12-bit limbs);
    # products are exact {0,1}-selections and sums stay < 2^24
    mm = lambda a: jax.lax.dot_general(
        a, ind, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return mm(hi)[0], mm(lo)[0]


def _shl(a, dx: int):
    if dx == 0:
        return a
    z = jnp.zeros((a.shape[0], abs(dx)), jnp.int32)
    if dx > 0:
        return jnp.concatenate([a[:, dx:], z], axis=1)
    return jnp.concatenate([z, a[:, :dx]], axis=1)


def _luma_kernel(refs, o_ref, *, h: int, w: int, order: int, temporal: bool):
    if temporal and order == 2:
        org_ref, rec_ref, top_ref, bot_ref, ind_ref, p1_ref, p2_ref = refs
    elif temporal:
        org_ref, rec_ref, top_ref, bot_ref, ind_ref, p1_ref = refs
    else:
        org_ref, rec_ref, top_ref, bot_ref, ind_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = j * jnp.int32(B)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, w), 0) + r0
    colsx = jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)
    in_pic = rows < jnp.int32(h)
    ind = ind_ref[...]

    org = org_ref[0].astype(jnp.int32)
    rec = rec_ref[0].astype(jnp.int32)

    # SSE (all pixels of real rows; padded rows are zero anyway)
    d = jnp.where(in_pic, org - rec, jnp.int32(0))
    o_ref[0, 0, 0, :], o_ref[0, 0, 1, :] = _block_reduce(d * d, ind)

    # spatial activity: |12c - 2(l+r+u+d) - diagonals| on the interior
    top = top_ref[0].astype(jnp.int32)   # 8 rows ending just above the band
    bot = bot_ref[0].astype(jnp.int32)   # 8 rows starting just below
    up = jnp.concatenate([top[HALO - 1 :], org[: B - 1]], axis=0)
    down = jnp.concatenate([org[1:], bot[:1]], axis=0)
    lap = jnp.abs(
        jnp.int32(12) * org - jnp.int32(2) * (_shl(org, -1) + _shl(org, 1) + up + down)
        - (_shl(up, -1) + _shl(up, 1) + _shl(down, -1) + _shl(down, 1))
    )
    active = (rows >= jnp.int32(1)) & (rows < jnp.int32(h - 1)) & (colsx >= jnp.int32(1)) & (colsx < jnp.int32(w - 1))
    o_ref[0, 0, 2, :], o_ref[0, 0, 3, :] = _block_reduce(
        jnp.where(active, lap, jnp.int32(0)), ind)

    # temporal activity (zero-filled for missing previous frames)
    if temporal:
        p1 = jnp.where(i >= jnp.int32(1), p1_ref[0].astype(jnp.int32), jnp.int32(0))
        if order == 2:
            p2 = jnp.where(i >= jnp.int32(2), p2_ref[0].astype(jnp.int32), jnp.int32(0))
            t = org - jnp.int32(2) * p1 + p2
        else:
            t = org - p1
        o_ref[0, 0, 4, :], o_ref[0, 0, 5, :] = _block_reduce(
            jnp.where(in_pic, jnp.abs(t), jnp.int32(0)), ind)
    else:
        o_ref[0, 0, 4, :] = jnp.zeros_like(o_ref[0, 0, 4, :])
        o_ref[0, 0, 5, :] = jnp.zeros_like(o_ref[0, 0, 5, :])


def _chroma_kernel(org_ref, rec_ref, ind_ref, o_ref, *, h: int, w: int,
                   by: int):
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (by, w), 0) + j * jnp.int32(by)
    d = jnp.where(rows < h,
                  org_ref[0].astype(jnp.int32) - rec_ref[0].astype(jnp.int32),
                  jnp.int32(0))
    o_ref[0, 0, 0, :], o_ref[0, 0, 1, :] = _block_reduce(d * d, ind_ref[...])


def _pad_rows_to(x, rows: int):
    n, h, w = x.shape
    if h >= rows:
        return x
    return jnp.concatenate([x, jnp.zeros((n, rows - h, w), x.dtype)], axis=1)


def _combine(hi, lo):
    return hi.astype(jnp.float64) * 4096.0 + lo.astype(jnp.float64)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def luma_stats_pallas(org, rec, order: int, temporal: bool, nbw: int):
    """Per-64x64-block [sse, sa, ta] sums as exact-integer f64:
    returns (N, nbh, nbw) x3.  org/rec: (N, H, W) integer (8/10-bit)."""
    n, h, w = org.shape
    nbh = -(h // -B)
    nbw_pad = -(nbw // -128) * 128
    rows = nbh * B + HALO
    orgp = _pad_rows_to(org, rows)
    recp = _pad_rows_to(rec, rows)
    ind = jnp.asarray(_indicator(w, B, nbw_pad))
    qmax = np.int32((orgp.shape[1] - 1) // HALO)
    zero = np.int32(0)
    q = np.int32(B // HALO)
    kern = functools.partial(
        _luma_kernel, h=h, w=w, order=order, temporal=temporal)
    band = pl.BlockSpec((1, B, w), lambda i, j: (i, j, zero),
                        memory_space=pltpu.VMEM)
    top = pl.BlockSpec(
        (1, HALO, w),
        lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
        memory_space=pltpu.VMEM)
    bot = pl.BlockSpec(
        (1, HALO, w),
        lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmax), zero),
        memory_space=pltpu.VMEM)
    indspec = pl.BlockSpec(ind.shape, lambda i, j: (zero, zero),
                           memory_space=pltpu.VMEM)
    specs = [band, band, top, bot, indspec]
    args = [orgp, recp, orgp, orgp, ind]
    if temporal:
        specs.append(pl.BlockSpec(
            (1, B, w),
            lambda i, j: (jnp.maximum(i - np.int32(1), zero), j, zero),
            memory_space=pltpu.VMEM))
        args.append(orgp)
        if order == 2:
            specs.append(pl.BlockSpec(
                (1, B, w),
                lambda i, j: (jnp.maximum(i - np.int32(2), zero), j, zero),
                memory_space=pltpu.VMEM))
            args.append(orgp)

    def kern_wrap(*all_refs):
        kern(all_refs[:-1], all_refs[-1])

    out = pl.pallas_call(
        kern_wrap,
        out_shape=jax.ShapeDtypeStruct((n, nbh, 8, nbw_pad), jnp.float32),
        grid=(n, nbh),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, 8, nbw_pad),
                               lambda i, j: (i, j, zero, zero),
                               memory_space=pltpu.VMEM),
    )(*args)
    out = out[:, :, :, :nbw]
    sse = _combine(out[:, :, 0], out[:, :, 1])
    sa = _combine(out[:, :, 2], out[:, :, 3])
    ta = _combine(out[:, :, 4], out[:, :, 5])
    return sse, sa, ta


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def chroma_sse_pallas(org, rec, by: int, bx: int, nbw: int):
    """(N, nbh, nbw) exact-integer f64 per-(by x bx)-block SSE for one
    chroma plane."""
    n, h, w = org.shape
    nbh = -(h // -by)
    nbw_pad = -(nbw // -128) * 128
    orgp = _pad_rows_to(org, nbh * by)
    recp = _pad_rows_to(rec, nbh * by)
    ind = jnp.asarray(_indicator(w, bx, nbw_pad))
    zero = np.int32(0)
    kern = functools.partial(_chroma_kernel, h=h, w=w, by=by)
    band = pl.BlockSpec((1, by, w), lambda i, j: (i, j, zero),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nbh, 8, nbw_pad), jnp.float32),
        grid=(n, nbh),
        in_specs=[band, band,
                  pl.BlockSpec(ind.shape, lambda i, j: (zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, nbw_pad),
                               lambda i, j: (i, j, zero, zero),
                               memory_space=pltpu.VMEM),
    )(orgp, recp, ind)
    return _combine(out[:, :, 0, :nbw], out[:, :, 1, :nbw])
