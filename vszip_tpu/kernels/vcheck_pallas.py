"""Fused Pallas kernel for EEDI3's vcheck reliability pass.

The reference's vcheckLine (src/filters/eedi3.zig vcheck block) is a
line-sequential sweep: interpolated line i blends toward a vertically-safe
interpolation using neighborhood stats that read the PREVIOUSLY UPDATED
line (two destination rows above).  The XLA formulation is a lax.scan whose
per-step work is tiny (one (B, W) row), so on TPU it is pure loop-overhead
bound (~24 ms for 538 lines at 8x1920 — vcheck alone halved EEDI3's
throughput).

This kernel runs the sweep as a SEQUENTIAL PALLAS GRID over lines: all
per-line inputs are pre-gathered outside into (n_off, ...) tensors so each
grid step streams one (B_BLK, W) row set through auto-pipelined VMEM
blocks, and the carried updated-line rides a VMEM scratch register across
grid steps (grid axes iterate sequentially on TPU).  The per-pixel
direction lookup result[x] = row[x + o[x]] is a compare-select chain
over the 2*mdis+1 static shifts, shared across the 3 rows of each
direction stack (see _gather_stack for why log-shift doesn't apply).

Bit-identical to the scan path (tests/test_kernels_interpret.py drives
both on the CPU interpreter).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_BLK = 8  # batch rows per grid instance (one VPU sublane group)
zero = np.int32(0)  # index-map literal (a bare python 0 traces as i64)


def _gather_stack(rows_pad, s, m: int, w: int):
    """rows_pad: (3, B, w + 2m) edge-padded rows; s: (B, w) int32 in
    [0, 2m].  Returns r with r[k, b, x] = rows_pad[k, b, x + s[b, x]].
    Compare-select chain over the 2m+1 static shifts (a per-lane
    variable shift cannot be decomposed into log2 uniform shifts: each
    shift step would pull a value already routed by the NEIGHBOR's
    offset bits).  The 3 rows of a direction stack share one chain."""
    acc = jax.lax.slice_in_dim(rows_pad, 0, w, axis=2)
    for o in range(1, 2 * m + 1):
        seg = jax.lax.slice_in_dim(rows_pad, o, o + w, axis=2)
        acc = jnp.where(s[None] == o, seg, acc)
    return acc


def _kernel(dl_ref, nb_ref, dm_ref, cint_ref, init_ref, out_ref, carry_ref,
            *, w: int, mdis: int, hp: bool, vcheck: int, rcp0: float,
            rcp1: float, rcp2: float, vt2: float):
    """One grid step = one interpolated line for a B_BLK batch block.

    dl_ref:   (1, B, W) f32  pre-update interpolated line (pd)
    nb_ref:   (1, 3, B, W) f32  neighbor rows (pd-1, pd+1, pd+2)
    dm_ref:   (1, 3, B, W) i32  direction rows (off-1, off, off+1)
    cint_ref: (1, B, W) f32  vertically-safe interpolation for this line
    init_ref: (1, B, W) f32  dst row pds[0]-2 (carry seed)
    out_ref:  (1, B, W) f32  updated line
    carry_ref: (B, W) f32 VMEM scratch persisting across the line axis
    (the grid's last axis iterates sequentially on TPU)."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        carry_ref[...] = init_ref[0]

    d2p = carry_ref[...]
    dl = dl_ref[0]
    d1p, d1n, d2n = nb_ref[0, 0], nb_ref[0, 1], nb_ref[0, 2]
    dm_p, dm_c, dm_n = dm_ref[0, 0], dm_ref[0, 1], dm_ref[0, 2]
    cint = cint_ref[0]

    f32 = jnp.float32
    col = jax.lax.broadcasted_iota(jnp.int32, dl.shape, 1)

    keep = (dm_c == 0)
    keep |= (jnp.maximum(dm_c * dm_p, dm_c * dm_n) < 0) | (
        (dm_p == dm_n) & (dm_p == 0))
    if hp:
        even = (dm_c & 1) == 0
        maxoff = jnp.where(
            even, jnp.abs(dm_c >> 1),
            jnp.maximum(jnp.abs(dm_c >> 1), jnp.abs((dm_c + 1) >> 1)))
    else:
        maxoff = jnp.abs(dm_c)
    keep |= (col + maxoff >= w) | (col - maxoff < 0)

    m = mdis

    def pad_edge(r):
        return jnp.concatenate(
            [jnp.repeat(r[:, :1], m, axis=1), r,
             jnp.repeat(r[:, -1:], m, axis=1)], axis=1)

    up_p = jnp.stack([pad_edge(d2p), pad_edge(d1p), pad_edge(dl)])
    dn_p = jnp.stack([up_p[2], pad_edge(d1n), pad_edge(d2n)])

    def gup(o):  # gathers of the up stack (d2p, d1p, dl) at +o
        return _gather_stack(up_p, o + m, m, w)

    def gdn(o):  # gathers of the down stack (dl, d1n, d2n) at -o
        return _gather_stack(dn_p, m - o, m, w)

    if hp:
        d20 = dm_c >> 1
        d21 = (dm_c + 1) >> 1
        a20, a21 = gup(d20), gup(d21)
        b20, b21 = gdn(d20), gdn(d21)
        s2ps, s1ps, pa0 = (a20[0] + a21[0], a20[1] + a21[1], a20[2] + a21[2])
        ps0, s1ns, s2ns = (b20[0] + b21[0], b20[1] + b21[1], b20[2] + b21[2])
        it_o = (s2ps + ps0) * f32(0.25)
        vt_o = (jnp.abs(s2ps - s1ps) + jnp.abs(pa0 - s1ps)) * f32(0.5)
        ib_o = (pa0 + s2ns) * f32(0.25)
        vb_o = (jnp.abs(s2ns - s1ns) + jnp.abs(ps0 - s1ns)) * f32(0.5)
        it_e = (a20[0] + b20[0]) * f32(0.5)
        ib_e = (a20[2] + b20[2]) * f32(0.5)
        vt_e = jnp.abs(a20[0] - a20[1]) + jnp.abs(a20[2] - a20[1])
        vb_e = jnp.abs(b20[2] - b20[1]) + jnp.abs(b20[0] - b20[1])
        it = jnp.where(even, it_e, it_o)
        ib = jnp.where(even, ib_e, ib_o)
        vt = jnp.where(even, vt_e, vt_o)
        vb = jnp.where(even, vb_e, vb_o)
        dabs = jnp.abs(dm_c) >> 1
    else:
        gu = gup(dm_c)
        gd = gdn(dm_c)
        it = (gu[0] + gd[0]) * f32(0.5)
        ib = (gu[2] + gd[2]) * f32(0.5)
        vt = jnp.abs(gu[0] - gu[1]) + jnp.abs(gu[2] - gu[1])
        vb = jnp.abs(gd[2] - gd[1]) + jnp.abs(gd[0] - gd[1])
        dabs = jnp.abs(dm_c)

    vc = jnp.abs(dl - d1p) + jnp.abs(dl - d1n)
    d0 = jnp.abs(it - d1p)
    d1_ = jnp.abs(ib - d1n)
    d2_ = jnp.abs(vt - vc)
    d3_ = jnp.abs(vb - vc)
    if vcheck == 1:
        m0, m1 = jnp.minimum(d0, d1_), jnp.minimum(d2_, d3_)
    elif vcheck == 2:
        m0 = (d0 + d1_) * f32(0.5)
        m1 = (d2_ + d3_) * f32(0.5)
    else:
        m0, m1 = jnp.maximum(d0, d1_), jnp.maximum(d2_, d3_)
    a0 = m0 * f32(rcp0)
    a1 = m1 * f32(rcp1)
    a2 = jnp.maximum((f32(vt2) - dabs.astype(jnp.float32)) * f32(rcp2),
                     f32(0.0))
    a = jnp.minimum(jnp.maximum(a0, jnp.maximum(a1, a2)), f32(1.0))
    tl = (f32(1.0) - a) * dl + a * cint
    tl = jnp.where(keep, cint, tl)
    out_ref[0] = tl
    carry_ref[...] = tl


@partial(jax.jit,
         static_argnums=(5, 6, 7, 8, 9, 10, 11, 12),
         static_argnames=("interpret",))
def vcheck_pallas(dl, nb, dm, cint, init, w: int, mdis: int, hp: bool,
                  vcheck: int, rcp0: float, rcp1: float, rcp2: float,
                  vt2: float, interpret: bool = False):
    """dl/cint: (n_off, B, W) f32; nb: (n_off, 3, B, W) f32;
    dm: (n_off, 3, B, W) i32; init: (B, W) f32.  B must be a multiple of
    B_BLK (callers pad).  Returns (n_off, B, W) updated lines."""
    n_off, b, width = dl.shape
    nb_blk = b // B_BLK
    kern = partial(_kernel, w=w, mdis=mdis, hp=hp, vcheck=vcheck,
                   rcp0=rcp0, rcp1=rcp1, rcp2=rcp2, vt2=vt2)
    return pl.pallas_call(
        kern,
        grid=(nb_blk, n_off),
        in_specs=[
            pl.BlockSpec((1, B_BLK, width), lambda bi, li: (li, bi, zero)),
            pl.BlockSpec((1, 3, B_BLK, width),
                         lambda bi, li: (li, zero, bi, zero)),
            pl.BlockSpec((1, 3, B_BLK, width),
                         lambda bi, li: (li, zero, bi, zero)),
            pl.BlockSpec((1, B_BLK, width), lambda bi, li: (li, bi, zero)),
            pl.BlockSpec((1, B_BLK, width), lambda bi, li: (zero, bi, zero)),
        ],
        out_specs=pl.BlockSpec((1, B_BLK, width),
                               lambda bi, li: (li, bi, zero)),
        out_shape=jax.ShapeDtypeStruct((n_off, b, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_BLK, width), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(dl, nb, dm, cint, init[None])
