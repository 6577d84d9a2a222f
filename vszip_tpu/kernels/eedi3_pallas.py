"""Pallas TPU kernels for the EEDI3 Viterbi DP (forward + backtrack).

Reference: src/filters/eedi3.zig:459-565 (the per-line left-to-right DP
with +-1 transitions, gamma-penalized, and its i8 backtrack matrix; the
HP variant widens to +-2 transitions with halved gamma for odd steps).

The jnp path runs the DP as a `lax.scan` over x consuming a
(tpitch, B, L, W) cost tensor from HBM (~1.4 GB at batch 8, 1080p) in
K-grouped steps — each step touches a thin (tpitch, B, L) slab, so the
pass is bound by per-step latency, not compute.  Here the whole sweep
runs as two Pallas kernels over a (W, TP, BL) relayout of the costs:

- forward: grid (line-tile, x-chunk), x-chunks iterated sequentially per
  128-lane line tile with the (TP, 128) pcost state held in VMEM scratch
  across grid steps; each fori step does the 3-way (5-way hp) strict-less
  candidate combine as sublane rolls of the state and writes the argmin
  delta row to the piT output block.
- backtrack: the same grid with the x-chunk index map reversed; the
  per-line path state f (1, 128) lives in scratch, and the per-pixel
  tpitch lookup piT[x+1][mdis + f] is a one-hot compare against a sublane
  iota folded with a sum — no gathers anywhere.

tpitch is padded to TP (sublane multiple): pad rows carry FLT_MAX*0.9
costs, so rolled-in pad rows never win the strict-less combine and the
state invariant (pad rows stay ~big) holds without re-masking.  x is
padded to an XC multiple with big costs; the backtrack pins f = 0 for
x >= w-1, which both seeds the reference's fpath[w-1] = 0 and inertly
consumes the pad region (deltas at x <= w-2 only ever read piT[<= w-1]).

All in-kernel integer state is i32 and loop counters are carried i32
(under jax x64 the fori induction variable is i64, which Mosaic cannot
lower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(np.finfo(np.float32).max * 0.9)


def _chunk_cols(tp_pad: int) -> int:
    """x-chunk length: keep the (XC, TP, 128) f32 cost block near ~3 MB."""
    if tp_pad <= 56:
        return 128
    if tp_pad <= 112:
        return 64
    return 32


def _fwd_kernel(tc_ref, piT_ref, pcost_ref, *, xc: int, tp_pad: int,
                hp: bool, gamma: float):
    """One x-chunk of the forward DP for one 128-line tile."""
    j = pl.program_id(1)
    x0 = j.astype(jnp.int32) * jnp.int32(xc)
    big = jnp.float32(BIG)
    g = jnp.float32(gamma)
    gh = jnp.float32(gamma * 0.5)

    def step(_, k):
        tc = tc_ref[k]  # (TP, 128) f32; pad rows/pad x hold BIG
        p = pcost_ref[:]
        # transition candidates: sublane rolls of the state.  Pad rows of
        # p hold ~big, so a roll never surfaces a live value at an edge
        # row, matching the reference's out-of-range "no candidate".
        # roll shifts must be i32 scalars: under jax x64 a Python int
        # lowers as i64, which tpu.dynamic_rotate rejects.
        if hp:
            cands = [
                (pltpu.roll(p, jnp.int32(2), axis=0) + g, -2),
                (pltpu.roll(p, jnp.int32(1), axis=0) + gh, -1),
                (p, 0),
                (pltpu.roll(p, jnp.int32(tp_pad - 1), axis=0) + gh, 1),
                (pltpu.roll(p, jnp.int32(tp_pad - 2), axis=0) + g, 2),
            ]
        else:
            cands = [
                (pltpu.roll(p, jnp.int32(1), axis=0) + g, -1),
                (p, 0),
                (pltpu.roll(p, jnp.int32(tp_pad - 1), axis=0) + g, 1),
            ]
        bval, bd = cands[0][0], jnp.full((tp_pad, 128), cands[0][1], jnp.int32)
        for cv, dv in cands[1:]:
            m = cv < bval
            bval = jnp.where(m, cv, bval)
            bd = jnp.where(m, jnp.int32(dv), bd)
        new_p = jnp.minimum(bval + tc, big)
        is0 = (x0 + k) == jnp.int32(0)
        pcost_ref[:] = jnp.where(is0, tc, new_p)
        piT_ref[k] = jnp.where(is0, jnp.int32(0), bd)
        return k + jnp.int32(1)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(xc), step, jnp.int32(0),
                      unroll=False)


def _bwd_kernel(piT_ref, piT_next_ref, fp_ref, f_ref, *, xc: int, ncx: int,
                tpitch: int, tp_pad: int, w: int):
    """One reversed x-chunk of the backtrack for one 128-line tile."""
    j = pl.program_id(1)
    jr = jnp.int32(ncx - 1) - j.astype(jnp.int32)
    x0 = jr * jnp.int32(xc)
    center = jnp.int32((tpitch - 1) // 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (tp_pad, 128), 0)

    @pl.when(j == 0)
    def _():
        f_ref[:] = jnp.zeros((1, 128), jnp.int32)

    def step(_, ki):
        x = x0 + ki
        # delta source is piT at x+1; the chunk's last row reads the first
        # row of the following (already processed) chunk.
        a = piT_ref[jnp.minimum(ki + jnp.int32(1), jnp.int32(xc - 1))]
        b = piT_next_ref[0]
        piT_x1 = jnp.where(ki == jnp.int32(xc - 1), b, a)
        f = f_ref[:]  # (1, 128)
        idx = center + f
        delta = jnp.sum(
            jnp.where(sub == idx, piT_x1, jnp.int32(0)), axis=0,
            keepdims=True, dtype=jnp.int32)
        active = x < jnp.int32(w - 1)
        f_new = jnp.where(active, f + delta, jnp.int32(0))
        f_ref[:] = f_new
        fp_ref[ki] = f_new
        return ki - jnp.int32(1)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(xc), step, jnp.int32(xc - 1),
                      unroll=False)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def dp_pallas(tct, tpitch: int, hp: bool, gamma: float, w: int):
    """tct: (Wp, TP, BLp) f32 cost tensor, x-leading, tpitch padded to a
    sublane multiple with BIG rows, lines padded to a 128 multiple, x
    padded to the chunk multiple with BIG columns.  `w` is the true
    width.  Returns fpath (Wp, BLp) i32 (zero for x >= w-1, matching the
    reference's fpath[w-1] = 0)."""
    wp, tp_pad, blp = tct.shape
    xc = _chunk_cols(tp_pad)
    assert wp % xc == 0 and blp % 128 == 0
    ncx = wp // xc
    nbl = blp // 128

    zero = np.int32(0)
    piT = pl.pallas_call(
        functools.partial(_fwd_kernel, xc=xc, tp_pad=tp_pad, hp=hp,
                          gamma=gamma),
        out_shape=jax.ShapeDtypeStruct((wp, tp_pad, blp), jnp.int32),
        grid=(nbl, ncx),
        in_specs=[pl.BlockSpec((xc, tp_pad, 128), lambda i, j: (j, zero, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((xc, tp_pad, 128), lambda i, j: (j, zero, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tp_pad, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tct)
    return _backtrack(piT, tpitch, w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _backtrack(piT, tpitch: int, w: int):
    wp, tp_pad, blp = piT.shape
    xc = _chunk_cols(tp_pad)
    ncx = wp // xc
    nbl = blp // 128
    ncx_m1 = np.int32(ncx - 1)
    zero = np.int32(0)
    one = np.int32(1)

    fp = pl.pallas_call(
        functools.partial(_bwd_kernel, xc=xc, ncx=ncx, tpitch=tpitch,
                          tp_pad=tp_pad, w=w),
        out_shape=jax.ShapeDtypeStruct((wp, 1, blp), jnp.int32),
        grid=(nbl, ncx),
        in_specs=[
            pl.BlockSpec((xc, tp_pad, 128),
                         lambda i, j: (ncx_m1 - j, zero, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xc, tp_pad, 128),
                         lambda i, j: (jnp.minimum(ncx_m1 - j + one, ncx_m1),
                                       zero, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((xc, 1, 128),
                               lambda i, j: (ncx_m1 - j, zero, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(piT, piT)
    return fp[:, 0, :]
