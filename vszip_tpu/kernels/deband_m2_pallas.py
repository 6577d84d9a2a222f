"""Fused Pallas TPU band kernel for Deband sample mode 2 (the default).

Reference: src/filters/deband_int.zig (m2 avg_4 pairing) +
src/vapoursynth/deband.zig:149-227 (ref-offset generation).  Mode 2's four
taps are jointly 2-D, which a direct implementation pays for as four full-
plane per-pixel gathers (~1 element/cycle on TPU, the op's measured
bottleneck at ~135 fps).  But the offsets carry only TWO independent
per-pixel values (val1, val2), both bounded by min(range, edge distances):

    r1 = src[y + val2][x + val1]      r3 = src[y - val2][x - val1]
    r2 = src[y - val1][x + val2]      r4 = src[y + val1][x - val2]

so the whole quadruple resolves gather-free as ONE masked select chain
over the joint (val1, val2) alphabet — (2*range+1)^2 combos, default 961 —
with a single compare per combo feeding all four taps.  The chain runs on
a VMEM-resident row band; two u16 frames ride each u32 lane (the masks are
shared per pixel position, so packing halves the select work), and the m2
center arithmetic runs in-kernel on the unpacked halves.

Loop structure: two 31-iteration `fori_loop`s, one per tap pair.  Each
pair's DYNAMIC offset is its lane offset, riding two incrementally
`pltpu.roll`-ed slab copies so every read stays lane-aligned (lane-
misaligned static slices measured ~2x slower); its static row offset is a
cheap sublane slice, unrolled in Python.  Rolled-in wrap lanes/rows and
the zero lane padding are never selected because |val1|,|val2| <=
min(x, w-1-x, y, h-1-y) by construction (same argument as
deband_pallas.py).  Measured on one v5e at 32x1080p YUV420P16: 165 ms
(194 fps) at range 15 vs 237 ms (135 fps) for the packed-gather path —
and the chain shrinks quadratically with smaller `range` (281+ fps at
range 8) while the gather cost is range-independent.  This is the
formulation's VPU floor: 961 combos x (2 cmp + 4 load + 4 select) on the
band; selection among N alternatives costs N-1 SIMD selects, so no
select-tree or mask factorization goes below it, and a measured XLA
take-based gather retires ~1 element/cycle regardless of index layout.
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
# lane padding is a full 128-lane register so every per-combo read of the
# center window starts lane-aligned (a 16-lane pad made every select read
# misaligned, costing ~2x VPU throughput)
PADL = 128


def _m2_band_kernel(kb, xb, xt, xbo, o_ref, slab, *, blur_first: bool,
                    rmax: int, thr: int, w: int):
    slab[:HALO] = xt[0]
    slab[HALO : HALO + B] = xb[0]
    slab[HALO + B :] = xbo[0]
    full = slab[...]  # (B + 2*HALO, w + 2*PADL) packed-u32 bits as i32
    c = full[HALO : HALO + B, PADL : PADL + w]
    k = kb[...]
    nlane = np.int32(full.shape[1])
    na = 2 * rmax + 1

    # Two 31-iter loops, each resolving one tap pair with its DYNAMIC
    # offset riding incremental lane-rolls (reads stay lane-aligned; the
    # lane-misaligned static slices of the first design cost ~2x) and its
    # static offset as cheap sublane slices.
    #
    # Loop 1 (d = val2 + rmax dynamic, a = val1 unrolled): r2/r4 —
    #   r2 = full[HALO-a..][x + b], r4 = full[HALO+a..][x - b].
    # Loop 2 (d = val1 + rmax dynamic, b = val2 unrolled): r1/r3 —
    #   r1 = full[HALO+b..][x + a], r3 = full[HALO-b..][x - a].

    def body1(_, carry):
        # i32 counter carried explicitly: the fori induction var is i64
        # under x64 and Mosaic has no i64 lowering
        r2, r4, lf, rt, d = carry
        lf = pltpu.roll(lf, nlane - np.int32(1), 1)
        rt = pltpu.roll(rt, np.int32(1), 1)
        for a in range(-rmax, rmax + 1):
            m = k == (np.int32((a + rmax) * na) + d)
            r2 = jnp.where(m, lf[HALO - a : HALO - a + B, PADL : PADL + w], r2)
            r4 = jnp.where(m, rt[HALO + a : HALO + a + B, PADL : PADL + w], r4)
        return r2, r4, lf, rt, d + jnp.int32(1)

    def body2(_, carry):
        r1, r3, lf, rt, d = carry
        lf = pltpu.roll(lf, nlane - np.int32(1), 1)
        rt = pltpu.roll(rt, np.int32(1), 1)
        for b in range(-rmax, rmax + 1):
            m = k == (d * np.int32(na) + np.int32(b + rmax))
            r1 = jnp.where(m, lf[HALO + b : HALO + b + B, PADL : PADL + w], r1)
            r3 = jnp.where(m, rt[HALO - b : HALO - b + B, PADL : PADL + w], r3)
        return r1, r3, lf, rt, d + jnp.int32(1)

    # init rolls position the slabs for d = -1 (one body roll lands on
    # offset -rmax)
    lf0 = pltpu.roll(full, jnp.int32(rmax + 1), 1)
    rt0 = pltpu.roll(full, nlane - jnp.int32(rmax + 1), 1)
    r2, r4, *_ = jax.lax.fori_loop(
        0, na, body1, (c, c, lf0, rt0, jnp.int32(0)))
    r1, r3, *_ = jax.lax.fori_loop(
        0, na, body2, (c, c, lf0, rt0, jnp.int32(0)))

    lo16 = jnp.int32(0xFFFF)
    halves = []
    for half in (0, 16):
        taps = [((v >> half) & lo16) for v in (c, r1, r3, r2, r4)]
        halves.append(_mode_center(2, blur_first, True, taps[0], taps[1],
                                   taps[2], taps[3], taps[4], thr, 0, 0))
    o_ref[0] = halves[0] | (halves[1] << 16)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def deband_m2_center_pallas(x, key, blur_first: bool, rmax: int, thr: int):
    """x: (N, H, W) uint16 (internal depth); key: (H, W) int32 joint offset
    key (val1 + rmax) * (2*rmax + 1) + (val2 + rmax).  Returns the m2
    pre-grain center as (N, H, W) int32."""
    n, h, w = x.shape
    n2 = (n + 1) // 2
    if n & 1:
        x = jnp.concatenate([x, jnp.zeros((1, h, w), x.dtype)], axis=0)
    xp = (x[0::2].astype(jnp.uint32)
          | (x[1::2].astype(jnp.uint32) << 16)).astype(jnp.int32)

    nbh = -(h // -B)
    rows = nbh * B + HALO
    if xp.shape[1] < rows:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n2, rows - xp.shape[1], w), jnp.int32)], axis=1)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (PADL, PADL)))
    kp = key
    if kp.shape[0] < nbh * B:
        kp = jnp.concatenate(
            [kp, jnp.zeros((nbh * B - kp.shape[0], w), key.dtype)], axis=0)

    qmax = np.int32((xp.shape[1] - 1) // HALO)
    zero = np.int32(0)
    q = np.int32(B // HALO)
    wp = w + 2 * PADL
    specs = [
        pl.BlockSpec((B, w), lambda i, j: (j, zero), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, wp), lambda i, j: (i, j, zero),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, HALO, wp),
            lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, HALO, wp),
            lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmax), zero),
            memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(_m2_band_kernel, blur_first=blur_first,
                             rmax=rmax, thr=thr, w=w)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n2, nbh * B, w), jnp.int32),
        grid=(n2, nbh),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, B, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B + 2 * HALO, wp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(kp, xp, xp, xp)
    out = out[:, :h]
    lo = (out & 0xFFFF).astype(jnp.int32)
    hi = ((out >> 16) & 0xFFFF).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=1).reshape(-1, h, w)[:n]
