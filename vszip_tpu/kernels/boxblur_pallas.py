"""Fused Pallas TPU kernels for BoxBlur (integer formats).

Two families: the comptime path (single pass, hr == vr, reflect-101 top +
bottom-quirk mirrors) fuses both axes into one kernel; the runtime path
(multi-pass / asymmetric radii, symmetric duplicate-edge mirror) gets one
kernel per 1-D pass, sharing the same machinery.

The comptime kernel computes the reference's comptime BoxBlur (src/filters/boxblur_comptime.zig:
V raw column sums quantized at ``(col*inv + 2^31) >> 32``, then the H
fixed-point running pass) in ONE pass over HBM, with no padded input copy:
each grid step reads its TH-row tile plus two slim neighbor views (clamped
block index maps), computes the vertical window sums as MXU band matmuls in
global row coordinates, quantizes, runs the horizontal fixed-point pass in
VMEM, and stores TH output rows.  Bit-identical to the jnp reference path
(asserted in tests).

Key derivations that make this a pure-i32/u32 kernel (no 64-bit):

* vertical mirrors become band-matrix weights: for output row g the normal
  window is ``[v in [g-r, g+r]] + [v in [1, r-g]]`` (the second term is the
  reference's top reflect-101) and rows g >= hgt-r use the bottom quirk
  ``[v in [g-r, hgt-1]] + [v in [hgt-1-r, g-1]]`` (overlaps double-count,
  matching the mirror's duplicated taps) — entries in {0,1,2}, built from
  iota compares per block, no data movement.
* the MXU consumes the slab as bf16: u8 planes directly, u16 planes as hi/lo
  bytes re-joined after the matmul.  Integers <= 255 and weights <= 2 are
  bf16-exact and the f32 accumulator never rounds (partials < 2^24).
* vertical quantize: ``(col*inv + 2^31) >> 32 == (2*col + ksize) // (2*ksize)``
  for every odd ksize <= 45 (proof in ops/boxblur.py), evaluated exactly in
  f32 with a floor + correction step.
* horizontal pass: ``out(x) = (C0 + inv2*(Wh(x)-Wh(0))) >> 16`` with
  ``C0 = (Wh(0)*inv + 2^31) >> 16``; Wh from an in-VMEM lane prefix sum
  (log-step rolls), the 38-bit product split into i32-safe limbs, and C0
  evaluated in u32 limbs; the first/last r lanes get mirror corrections via
  exchange-matrix lane reversal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_cumsum_i32(x):
    """Prefix sum along the last (lane) dim via log-step rolls."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, jnp.int32(s), x.ndim - 1)
        x = x + jnp.where(col >= s, shifted, jnp.int32(0))
        s *= 2
    return x


def _quantize_div(col, ksize: int):
    """Exact round-half-up division ``(2*col + ksize) // (2*ksize)`` in f32."""
    k2 = 2 * ksize
    t = (2 * col + ksize).astype(jnp.float32)
    q = jnp.floor(t * jnp.float32(1.0 / k2))
    rem = t - q * jnp.float32(k2)
    q = q + (rem >= jnp.float32(k2)).astype(jnp.float32)
    q = q - (rem < jnp.float32(0.0)).astype(jnp.float32)
    return q.astype(jnp.int32)


def _c0_u32(w0, inv: int):
    """C0 = (w0*inv + 2^31) >> 16 for w0 < 2^22, via u32 limbs."""
    ih = np.uint32(inv >> 16)
    il = np.uint32(inv & 0xFFFF)
    a = w0.astype(jnp.uint32)
    ah = a >> 11
    al = a & np.uint32(2047)
    p = ah * il
    t3 = (((p & np.uint32(31)) << 11) + al * il) >> 16
    c0 = a * ih + (p >> 5) + t3 + np.uint32(0x8000)
    c0h = (c0 >> 16).astype(jnp.int32)
    c0l = (c0 & np.uint32(0xFFFF)).astype(jnp.int32)
    return c0h, c0l


def _fixed_out(d, c0h, c0l, inv2: int):
    """(C0 + inv2*D) >> 16 with D = Wh - W0, in split i32 limbs."""
    a = np.int32(inv2) * (d >> 9)
    b = np.int32(inv2) * (d & np.int32(511))
    return c0h + (a >> 7) + ((c0l + ((a & np.int32(127)) << 9) + b) >> 16)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _mm16(a, b):
    """bf16 x bf16 -> f32 matmul (native MXU path; exact for integer inputs
    <= 255 with few enough terms that the f32 accumulator never rounds)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rev_lanes(x, r: int):
    """reverse the r lanes of (th, r) i32 (values < 2^27) via an exchange
    matmul, exact through a hi/lo split (each product has one term < 2^24)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    ex = (rows + cols == r - 1).astype(jnp.float32)
    hi = (x >> 12).astype(jnp.float32)
    lo = (x & jnp.int32(4095)).astype(jnp.float32)
    return (_mm(hi, ex).astype(jnp.int32) << 12) + _mm(lo, ex).astype(jnp.int32)


def _band_weights(g, v, lo_keep, hi_keep, radius: int, hgt: int):
    """Vertical window weight matrix in global row coordinates.

    g: (th, 1) global output rows; v: (th, L) global source rows of one input
    segment; [lo_keep, hi_keep) is the segment's ownership range (segments
    overlap when index maps clamp at the array edges — each global row must
    be counted by exactly one segment).
    """
    r = radius
    norm = ((v >= g - r) & (v <= g + r)).astype(jnp.int32) + (
        (v >= 1) & (v <= r - g)
    ).astype(jnp.int32)
    quirk = ((v >= g - r) & (v <= jnp.int32(hgt - 1))).astype(jnp.int32) + (
        (v >= jnp.int32(hgt - 1 - r)) & (v <= g - 1)
    ).astype(jnp.int32)
    wgt = jnp.where(g >= jnp.int32(hgt - r), quirk, norm)
    keep = (v >= lo_keep) & (v < hi_keep)
    return jnp.where(keep, wgt, jnp.int32(0)).astype(jnp.bfloat16)


def _ct_int_kernel(main_ref, head_ref, tail_ref, o_ref, *, radius: int,
                   hgt: int, th: int, rblk: int, qmax: int, inv: int,
                   inv2: int, wide: bool):
    r = radius
    ksize = 2 * r + 1
    # all scalar index math in explicit i32 (x64 mode would promote Python
    # ints to i64, which Mosaic cannot lower)
    i0 = pl.program_id(1) * jnp.int32(th)  # first output row of this block
    g = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0) + i0

    # ---- vertical window sums: MXU band matmuls over 64-row strips, each
    # contracting only its (64 + 2*rblk)-row halo (a whole-tile band matmul
    # would waste FLOPs on the zero region far from the diagonal); weights
    # are built in global row coords, so the top reflect-101 and bottom
    # quirk need no padded copy of the input ----
    head_off = jnp.maximum(i0 - jnp.int32(rblk), jnp.int32(0))
    tail_off = jnp.minimum(i0 + jnp.int32(th), jnp.int32(qmax * rblk))
    big = jnp.int32(2 ** 30)
    sh = 64  # strip height (th is a multiple of 64)
    main = main_ref[0]
    strips = []
    for st in range(th // sh):
        gs = jax.lax.broadcasted_iota(jnp.int32, (sh, 1), 0) + (
            i0 + jnp.int32(st * sh))
        lo_row = st * sh - rblk
        hi_row = st * sh + sh + rblk
        segs = []
        if lo_row < 0:
            segs.append((head_ref[0], rblk, head_off, -big, i0))
        mlo, mhi = max(lo_row, 0), min(hi_row, th)
        segs.append((
            jax.lax.slice(main, (mlo, 0), (mhi, main.shape[1])),
            mhi - mlo, i0 + jnp.int32(mlo), i0, i0 + th,
        ))
        if hi_row > th:
            segs.append((tail_ref[0], rblk, tail_off, i0 + th, big))
        bs = []
        for src, ln, off, lo_keep, hi_keep in segs:
            v = jax.lax.broadcasted_iota(jnp.int32, (sh, ln), 1) + off
            bs.append((_band_weights(gs, v, lo_keep, hi_keep, r, hgt),
                       src.astype(jnp.int32)))
        if wide:
            lo = sum(_mm16(b, (s & 255).astype(jnp.bfloat16)) for b, s in bs)
            hi = sum(_mm16(b, (s >> 8).astype(jnp.bfloat16)) for b, s in bs)
            wv = (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)
        else:
            wv = sum(
                _mm16(b, s.astype(jnp.bfloat16)) for b, s in bs
            ).astype(jnp.int32)
        strips.append(_quantize_div(wv, ksize))
    tmp = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=0)

    # ---- horizontal fixed-point pass on tmp (TH, W) ----
    w = tmp.shape[-1]
    cs = _lane_cumsum_i32(tmp)
    col = jax.lax.broadcasted_iota(jnp.int32, cs.shape, 1)
    # interior window sums: cs[x+r] - cs[x-r-1]
    a = pltpu.roll(cs, jnp.int32(w - r), 1)  # cyclic left-shift by r
    b = jnp.where(col >= r + 1, pltpu.roll(cs, jnp.int32(r + 1), 1), jnp.int32(0))
    wh = a - b
    w0 = cs[:, r : r + 1] + cs[:, r - 1 : r]
    c0h, c0l = _c0_u32(w0, inv)
    out = _fixed_out(wh - w0, c0h, c0l, inv2)
    o_ref[0] = out.astype(o_ref.dtype)
    # left edge lanes x < r: Wh = cs[x+r] + cs[r-x-1] — the second term is
    # the reversed head of cs; both edges become one (TH, r) store each
    wh_l = cs[:, r : 2 * r] + _rev_lanes(cs[:, 0:r], r)
    o_ref[0, :, 0:r] = _fixed_out(wh_l - w0, c0h, c0l, inv2).astype(o_ref.dtype)
    # right edge lanes x in [W-r, W-1]:
    # Wh = 2*cs[W-1] - cs[x-r-1] - cs[2W-2-x-r]
    cl = cs[:, w - 1 : w]
    wh_r = (
        2 * cl - cs[:, w - 2 * r - 1 : w - r - 1]
        - _rev_lanes(cs[:, w - 1 - r : w - 1], r)
    )
    o_ref[0, :, w - r : w] = _fixed_out(wh_r - w0, c0h, c0l, inv2).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def ct_blur_int_pallas(x, radius: int, tile_h: int = 256):
    """Fused comptime-path integer BoxBlur.  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    # TH: multiple of 64 (so the slim 32/64-row neighbor views divide it and
    # sublane tiling holds for u8/u16); among candidates up to tile_h pick
    # the one wasting the fewest out-of-range rows in the last block
    lo = 64
    hi = max(int(tile_h) & ~63, lo)
    th = min(
        range(lo, hi + 1, 64),
        key=lambda t: (-(h // -t) * t - h, -t),
    )
    rblk = 32 if 2 * r <= 32 else 64  # slim neighbor-view height (divides th)
    if h < rblk:
        # tiny planes: make the clamped views well-defined (cheap copy)
        x = jnp.concatenate(
            [x, jnp.zeros((n, rblk - h, w), x.dtype)], axis=1
        )
    hs = x.shape[1]
    # last slim-view index that still contains row hs-1 (the view may extend
    # past the array; out-of-range rows are garbage and carry zero weight)
    qmax = (hs - 1) // rblk
    num_blocks = pl.cdiv(h, th)

    kern = functools.partial(
        _ct_int_kernel, radius=r, hgt=h, th=th, rblk=rblk, qmax=qmax,
        inv=inv, inv2=inv2, wide=(x.dtype.itemsize == 2),
    )
    zero = np.int32(0)  # a Python-int 0 would trace as i64 under x64
    q = np.int32(th // rblk)
    qmx = np.int32(qmax)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rblk, w),
                lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rblk, w),
                lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmx), zero),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, zero), memory_space=pltpu.VMEM
        ),
    )(x, x, x)


# ---------------------------------------------------------------------------
# runtime path (any radius <= 22 per pass, duplicate-edge mirror)
# ---------------------------------------------------------------------------

def _sym_weights(g, v, lo_keep, hi_keep, radius: int, hgt: int):
    """Duplicate-edge symmetric-mirror window weights in global row coords
    (the runtime path's mirror, reference src/filters/boxblur_runtime.zig:
    ``m(-j) = j-1``, ``m(n-1+j) = n-j``): a tap k < 0 reads row -k-1 and a
    tap k >= hgt reads row 2*hgt-1-k.  Weights in {0,1,2,3}."""
    r = radius
    # the band clips at the real rows; taps past either edge re-enter below
    # as reflections
    w = ((v >= g - r) & (v <= g + r) & (v <= jnp.int32(hgt - 1))).astype(
        jnp.int32)
    # top reflection: taps k in [g-r, -1] read rows 0..r-g-1
    w = w + ((v >= 0) & (v <= jnp.int32(r) - g - 1)).astype(jnp.int32)
    # bottom reflection: taps k in [hgt, g+r] read rows 2*hgt-1-g-r..hgt-1
    w = w + (
        (v >= jnp.int32(2 * hgt - 1) - g - r) & (v <= jnp.int32(hgt - 1))
    ).astype(jnp.int32)
    keep = (v >= lo_keep) & (v < hi_keep)
    return jnp.where(keep, w, jnp.int32(0)).astype(jnp.bfloat16)


def _rt_v_kernel(main_ref, head_ref, tail_ref, aux_ref, o_ref, *, radius: int,
                 hgt: int, th: int, rblk: int, qmax: int, inv2: int,
                 wide: bool):
    r = radius
    i0 = pl.program_id(1) * jnp.int32(th)
    head_off = jnp.maximum(i0 - jnp.int32(rblk), jnp.int32(0))
    tail_off = jnp.minimum(i0 + jnp.int32(th), jnp.int32(qmax * rblk))
    big = jnp.int32(2 ** 30)
    w0 = aux_ref[0, 0:1, :]
    c0h = aux_ref[0, 1:2, :]
    c0l = aux_ref[0, 2:3, :]
    sh = 64
    main = main_ref[0]
    for st in range(th // sh):
        gs = jax.lax.broadcasted_iota(jnp.int32, (sh, 1), 0) + (
            i0 + jnp.int32(st * sh))
        lo_row = st * sh - rblk
        hi_row = st * sh + sh + rblk
        segs = []
        if lo_row < 0:
            segs.append((head_ref[0], rblk, head_off, -big, i0))
        mlo, mhi = max(lo_row, 0), min(hi_row, th)
        segs.append((
            jax.lax.slice(main, (mlo, 0), (mhi, main.shape[1])),
            mhi - mlo, i0 + jnp.int32(mlo), i0, i0 + th,
        ))
        if hi_row > th:
            segs.append((tail_ref[0], rblk, tail_off, i0 + th, big))
        bs = []
        for src, ln, off, lo_keep, hi_keep in segs:
            v = jax.lax.broadcasted_iota(jnp.int32, (sh, ln), 1) + off
            bs.append((_sym_weights(gs, v, lo_keep, hi_keep, r, hgt),
                       src.astype(jnp.int32)))
        if wide:
            lo = sum(_mm16(b, (s & 255).astype(jnp.bfloat16)) for b, s in bs)
            hi = sum(_mm16(b, (s >> 8).astype(jnp.bfloat16)) for b, s in bs)
            wv = (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)
        else:
            wv = sum(
                _mm16(b, s.astype(jnp.bfloat16)) for b, s in bs
            ).astype(jnp.int32)
        out = _fixed_out(wv - w0, c0h, c0l, inv2)
        o_ref[0, st * sh : (st + 1) * sh, :] = out.astype(o_ref.dtype)


def _rt_h_kernel(x_ref, o_ref, *, radius: int, th: int, inv: int, inv2: int):
    # the runtime H mirror (symmetric duplicate-edge) produces exactly the
    # comptime kernel's horizontal formulas: interior windows from the lane
    # prefix sum, edge lanes via exchange-matrix reversal
    r = radius
    tmp = x_ref[0].astype(jnp.int32)
    w = tmp.shape[-1]
    cs = _lane_cumsum_i32(tmp)
    col = jax.lax.broadcasted_iota(jnp.int32, cs.shape, 1)
    a = pltpu.roll(cs, jnp.int32(w - r), 1)
    b = jnp.where(col >= r + 1, pltpu.roll(cs, jnp.int32(r + 1), 1),
                  jnp.int32(0))
    wh = a - b
    w0 = cs[:, r : r + 1] + cs[:, r - 1 : r]
    c0h, c0l = _c0_u32(w0, inv)
    o_ref[0] = _fixed_out(wh - w0, c0h, c0l, inv2).astype(o_ref.dtype)
    wh_l = cs[:, r : 2 * r] + _rev_lanes(cs[:, 0:r], r)
    o_ref[0, :, 0:r] = _fixed_out(wh_l - w0, c0h, c0l, inv2).astype(
        o_ref.dtype)
    cl = cs[:, w - 1 : w]
    wh_r = (2 * cl - cs[:, w - 2 * r - 1 : w - r - 1]
            - _rev_lanes(cs[:, w - 1 - r : w - 1], r))
    o_ref[0, :, w - r : w] = _fixed_out(wh_r - w0, c0h, c0l, inv2).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def rt_blur_v_pallas(x, radius: int, tile_h: int = 256):
    """One runtime-path vertical pass (duplicate-edge mirror), bit-exact to
    the jnp running-sum formulation.  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    lo = 64
    hi = max(int(tile_h) & ~63, lo)
    th = min(range(lo, hi + 1, 64), key=lambda t: (-(h // -t) * t - h, -t))
    rblk = 32 if r <= 32 else 64
    if h < rblk:
        x = jnp.concatenate([x, jnp.zeros((n, rblk - h, w), x.dtype)], axis=1)
    hs = x.shape[1]
    qmax = (hs - 1) // rblk
    num_blocks = pl.cdiv(h, th)

    # per-column W(0) and its fixed-point constant, computed once on the
    # top r+1 rows (every grid block needs them, but only block 0 sees
    # those rows)
    top = x[:, : r + 1, :].astype(jnp.int32)
    w0 = (jnp.sum(top[:, :r, :], axis=1, dtype=jnp.int32)
          + jnp.sum(top, axis=1, dtype=jnp.int32))
    c0 = (w0.astype(jnp.int64) * inv + (1 << 31)) >> 16
    aux = jnp.stack(
        [w0, (c0 >> 16).astype(jnp.int32), (c0 & 0xFFFF).astype(jnp.int32)]
        + [jnp.zeros_like(w0)] * 5, axis=1,
    )  # (N, 8, W) i32

    kern = functools.partial(
        _rt_v_kernel, radius=r, hgt=h, th=th, rblk=rblk, qmax=qmax,
        inv2=inv2, wide=(x.dtype.itemsize == 2),
    )
    zero = np.int32(0)
    q = np.int32(th // rblk)
    qmx = np.int32(qmax)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        grid=(n, num_blocks),
        in_specs=[
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, w),
                         lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, w),
                         lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmx), zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda i, j: (i, zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
    )(x, x, x, aux)


@functools.partial(jax.jit, static_argnums=(1, 2))
def rt_blur_h_pallas(x, radius: int, tile_h: int = 256):
    """One runtime-path horizontal pass (duplicate-edge mirror), bit-exact
    to the jnp running-sum formulation.  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    lo = 64
    hi = max(int(tile_h) & ~63, lo)
    th = min(range(lo, hi + 1, 64), key=lambda t: (-(h // -t) * t - h, -t))
    num_blocks = pl.cdiv(h, th)
    kern = functools.partial(_rt_h_kernel, radius=r, th=th, inv=inv, inv2=inv2)
    zero = np.int32(0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        grid=(n, num_blocks),
        in_specs=[pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
    )(x)
