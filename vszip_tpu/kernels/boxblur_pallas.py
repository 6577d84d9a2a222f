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
  ``C0 = (Wh(0)*inv + 2^31) >> 16``; Wh via near-diagonal MXU strip matmuls
  whose weights encode both lane mirrors (see ``_h_window_matmul``), the
  38-bit product split into i32-safe limbs, and C0 evaluated in u32 limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _h_strip_layout(w: int, radius: int):
    """Static per-strip layout for the horizontal window matmuls: for each
    128-lane output strip, the aligned input row range [a0, a1) it contracts
    and its row offset into the concatenated host weight operand."""
    r = radius
    layout = []
    ro = 0
    for c0 in range(0, w, 128):
        c1 = min(c0 + 128, w)
        # 16-aligned (bf16 sublane tile) contraction bounds: a 128-aligned
        # segment made the MXU contract ~384 rows for a 2r+1-wide band
        a0 = max((c0 - r) // 16 * 16, 0)
        a1 = min(-((c1 + r) // -16) * 16, w)
        layout.append((c0, c1, a0, a1, ro))
        ro += a1 - a0
    return layout, ro


def _h_weights_host(w: int, radius: int) -> np.ndarray:
    """Host-precomputed horizontal band weights, concatenated per strip into
    one (total_rows, 128) f32 operand (cast to bf16 at trace time).  Weight
    entries derive from the exact prefix-sum identities of the reference
    pass (boxblur_runtime.zig / boxblur_comptime.zig horizontal sweeps):

    * interior ``x in [r, W-1-r]``: ``[x-r <= v <= x+r]``
    * left ``x < r``:   ``[v <= x+r] + [v <= r-1-x]``  (duplicate-edge mirror)
    * right ``x >= W-r``: ``[v >= x-r] + [v >= 2W-1-x-r]``

    Building these on the host removes ~7M VPU ops per grid block that the
    kernel used to spend on iota-compare weight construction.
    """
    r = radius
    layout, total = _h_strip_layout(w, radius)
    out = np.zeros((total, 128), np.float32)
    for c0, c1, a0, a1, ro in layout:
        v = np.arange(a0, a1)[:, None]
        x = np.arange(c0, c0 + 128)[None, :]
        interior = ((v >= x - r) & (v <= x + r)).astype(np.int32)
        left = (v <= x + r).astype(np.int32) + (v <= r - 1 - x).astype(
            np.int32)
        right = (v >= x - r).astype(np.int32) + (v >= 2 * w - 1 - r - x
                                                 ).astype(np.int32)
        wgt = np.where(x < r, left, np.where(x >= w - r, right, interior))
        out[ro : ro + (a1 - a0)] = wgt.astype(np.float32)
    return out


def _h_window_matmul(tmp, radius: int, narrow: bool, hw):
    """Horizontal window sums ``Wh(x)``: near-diagonal MXU strip matmuls
    against the host-precomputed band weights `hw` (see ``_h_weights_host``;
    the lane analogue of the vertical band matmuls — replaces a log-step
    lane prefix sum, which is cross-lane-shuffle-bound on the VPU).

    tmp: (th, W) i32 in [0, 2^16); exact because the hi/lo byte planes are
    bf16-exact and every partial sum stays < 2^24.
    """
    th, w = tmp.shape
    lo = (tmp & jnp.int32(255)).astype(jnp.bfloat16)
    hi = None if narrow else (tmp >> 8).astype(jnp.bfloat16)
    layout, _ = _h_strip_layout(w, radius)
    outs = []
    for c0, c1, a0, a1, ro in layout:
        b = jax.lax.slice(hw, (ro, 0), (ro + (a1 - a0), c1 - c0))
        slo = jax.lax.slice(lo, (0, a0), (th, a1))
        acc = _mm16(slo, b).astype(jnp.int32)
        if hi is not None:
            shi = jax.lax.slice(hi, (0, a0), (th, a1))
            acc = acc + (_mm16(shi, b).astype(jnp.int32) << 8)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _pick_tile(h: int, tile_h: int) -> int:
    """Block height: a multiple of 64 (so the slim 32/64-row neighbor views
    divide it and sublane tiling holds for u8/u16).  Measured on v5e, block
    COUNT dominates (per-block DMA/launch overhead), so minimize the number
    of grid blocks first, then the out-of-range rows in the last block."""
    lo = 64
    hi = max(int(tile_h) & ~63, lo)
    return min(
        range(lo, hi + 1, 64),
        key=lambda t: (-(h // -t), -(h // -t) * t - h, -t),
    )


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


def _mm16(a, b):
    """bf16 x bf16 -> f32 matmul (native MXU path; exact for integer inputs
    <= 255 with few enough terms that the f32 accumulator never rounds)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split16(a, wide: bool):
    """One-time cast of an integer slab to its bf16 byte planes (hi is None
    for u8).  Hoisted out of the strip loops: casting per-strip re-converted
    every halo row twice and dominated the VPU budget."""
    ai = a.astype(jnp.int32)
    if wide:
        return (ai & jnp.int32(255)).astype(jnp.bfloat16), (
            ai >> 8).astype(jnp.bfloat16)
    return ai.astype(jnp.bfloat16), None


@functools.lru_cache(maxsize=64)
def _h_weights_dev(w: int, radius: int) -> np.ndarray:
    # host bf16 ndarray (ml_dtypes), safe to cache across traces; values are
    # small integers so the f32 -> bf16 cast is exact
    return _h_weights_host(w, radius).astype(jnp.bfloat16)


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


def _ct_int_kernel(main_ref, head_ref, tail_ref, hw_ref, o_ref, *,
                   radius: int, hgt: int, th: int, rblk: int, qmax: int,
                   inv: int, inv2: int, wide: bool):
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
    w = main_ref.shape[-1]
    main_lo, main_hi = _split16(main_ref[0], wide)
    head_lo, head_hi = _split16(head_ref[0], wide)
    tail_lo, tail_hi = _split16(tail_ref[0], wide)
    # strip halo, rounded to the bf16 sublane tile (16): smaller contraction
    # for r <= 16 cuts the band-matmul FLOPs by 25%
    hpad = min(-(r // -16) * 16, rblk)
    strips = []
    for st in range(th // sh):
        gs = jax.lax.broadcasted_iota(jnp.int32, (sh, 1), 0) + (
            i0 + jnp.int32(st * sh))
        lo_row = st * sh - hpad
        hi_row = st * sh + sh + hpad
        segs = []
        if lo_row < 0:
            segs.append((head_lo, head_hi, rblk, head_off, -big, i0))
        mlo, mhi = max(lo_row, 0), min(hi_row, th)
        segs.append((
            jax.lax.slice(main_lo, (mlo, 0), (mhi, w)),
            None if main_hi is None else jax.lax.slice(
                main_hi, (mlo, 0), (mhi, w)),
            mhi - mlo, i0 + jnp.int32(mlo), i0, i0 + th,
        ))
        if hi_row > th:
            segs.append((tail_lo, tail_hi, rblk, tail_off, i0 + th, big))
        bs = []
        for slo, shi, ln, off, lo_keep, hi_keep in segs:
            v = jax.lax.broadcasted_iota(jnp.int32, (sh, ln), 1) + off
            bs.append((_band_weights(gs, v, lo_keep, hi_keep, r, hgt),
                       slo, shi))
        if wide:
            lo = sum(_mm16(b, s) for b, s, _ in bs)
            hi = sum(_mm16(b, s) for b, _, s in bs)
            wv = (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)
        else:
            wv = sum(_mm16(b, s) for b, s, _ in bs).astype(jnp.int32)
        strips.append(_quantize_div(wv, ksize))
    tmp = strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=0)

    # ---- horizontal fixed-point pass on tmp (TH, W): strip matmuls ----
    wh = _h_window_matmul(tmp, r, narrow=not wide, hw=hw_ref[...])
    w0 = wh[:, 0:1]
    c0h, c0l = _c0_u32(w0, inv)
    o_ref[0] = _fixed_out(wh - w0, c0h, c0l, inv2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def ct_blur_int_pallas(x, radius: int, tile_h: int | None = None):
    """Fused comptime-path integer BoxBlur.  x: (N, H, W) uint8/uint16.

    tile_h None = auto: the fewest, largest blocks that fit XLA's 16 MB
    scoped-VMEM stack (measured r5: fewer blocks win — one whole-plane
    1080x1920 block runs the flagship 9% faster than 256-row tiles, and
    the 2-block tiling most of that — per-block launch/DMA overhead
    dominates).  The ~9 B/px budget is the measured scoped footprint of
    the u16 path (in+out blocks + f32 transients) with headroom."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    if tile_h is None:
        tile_h = max(64, min(h + 63, (15 << 20) // (9 * w)))
    th = _pick_tile(h, tile_h)
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
    hw = _h_weights_dev(w, r)
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
            pl.BlockSpec(hw.shape, lambda i, j: (zero, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, zero), memory_space=pltpu.VMEM
        ),
    )(x, x, x, hw)


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
    w = main_ref.shape[-1]
    main_lo, main_hi = _split16(main_ref[0], wide)
    head_lo, head_hi = _split16(head_ref[0], wide)
    tail_lo, tail_hi = _split16(tail_ref[0], wide)
    hpad = min(-(r // -16) * 16, rblk)
    for st in range(th // sh):
        gs = jax.lax.broadcasted_iota(jnp.int32, (sh, 1), 0) + (
            i0 + jnp.int32(st * sh))
        lo_row = st * sh - hpad
        hi_row = st * sh + sh + hpad
        segs = []
        if lo_row < 0:
            segs.append((head_lo, head_hi, rblk, head_off, -big, i0))
        mlo, mhi = max(lo_row, 0), min(hi_row, th)
        segs.append((
            jax.lax.slice(main_lo, (mlo, 0), (mhi, w)),
            None if main_hi is None else jax.lax.slice(
                main_hi, (mlo, 0), (mhi, w)),
            mhi - mlo, i0 + jnp.int32(mlo), i0, i0 + th,
        ))
        if hi_row > th:
            segs.append((tail_lo, tail_hi, rblk, tail_off, i0 + th, big))
        bs = []
        for slo, shi, ln, off, lo_keep, hi_keep in segs:
            v = jax.lax.broadcasted_iota(jnp.int32, (sh, ln), 1) + off
            bs.append((_sym_weights(gs, v, lo_keep, hi_keep, r, hgt),
                       slo, shi))
        if wide:
            lo = sum(_mm16(b, s) for b, s, _ in bs)
            hi = sum(_mm16(b, s) for b, _, s in bs)
            wv = (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)
        else:
            wv = sum(_mm16(b, s) for b, s, _ in bs).astype(jnp.int32)
        out = _fixed_out(wv - w0, c0h, c0l, inv2)
        o_ref[0, st * sh : (st + 1) * sh, :] = out.astype(o_ref.dtype)


def _rt_h_kernel(x_ref, hw_ref, o_ref, *, radius: int, th: int, inv: int,
                 inv2: int, wide: bool, passes: int = 1):
    # the runtime H mirror (symmetric duplicate-edge) produces exactly the
    # comptime kernel's horizontal prefix-sum formulas — same strip matmuls.
    # Rows are independent, so EVERY pass of a multi-pass blur runs on the
    # VMEM-resident tile: one HBM round trip total instead of one per pass.
    r = radius
    tmp = x_ref[0].astype(jnp.int32)
    for _ in range(passes):
        wh = _h_window_matmul(tmp, r, narrow=not wide, hw=hw_ref[...])
        w0 = wh[:, 0:1]
        c0h, c0l = _c0_u32(w0, inv)
        tmp = _fixed_out(wh - w0, c0h, c0l, inv2)
    o_ref[0] = tmp.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def rt_blur_v_pallas(x, radius: int, tile_h: int = 256):
    """One runtime-path vertical pass (duplicate-edge mirror), bit-exact to
    the jnp running-sum formulation.  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    th = _pick_tile(h, tile_h)
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


def _v_window_sums(cur, s0, radius: int, hgt: int, wide: bool):
    """Duplicate-edge vertical window sums of a VMEM slab whose position s
    holds global row s0 + s (rows outside [0, hgt) hold garbage and carry
    zero weight).  Band matmuls per 64-row strip."""
    r = radius
    L, w = cur.shape
    hp = min(-((r + 1) // -16) * 16, 64)  # strip halo, bf16-tile rounded
    lo16 = (cur & jnp.int32(255)).astype(jnp.bfloat16)
    hi16 = (cur >> 8).astype(jnp.bfloat16) if wide else None
    strips = []
    for st in range(L // 64):
        seg_lo = max(st * 64 - hp, 0)
        seg_hi = min(st * 64 + 64 + hp, L)
        gs = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0) + (
            s0 + jnp.int32(st * 64))
        v = jax.lax.broadcasted_iota(
            jnp.int32, (64, seg_hi - seg_lo), 1) + (s0 + jnp.int32(seg_lo))
        wgt = _sym_weights(gs, v, jnp.int32(0), jnp.int32(hgt), r, hgt)
        acc = _mm16(wgt, jax.lax.slice(lo16, (seg_lo, 0), (seg_hi, w)))
        if wide:
            acc = acc + _mm16(
                wgt, jax.lax.slice(hi16, (seg_lo, 0), (seg_hi, w))
            ) * jnp.float32(256.0)
        strips.append(acc.astype(jnp.int32))
    return strips[0] if len(strips) == 1 else jnp.concatenate(strips, axis=0)


_TOPH = 128  # top-of-plane chain height for the fused multi-pass V kernel


def _rt_v_multi_kernel(main_ref, *rest, radius: int, passes: int, hgt: int,
                       th: int, kblk: int, inv: int, inv2: int, wide: bool):
    """All vertical passes fused on one VMEM slab (reference runs each pass
    as a separate plane sweep, src/filters/boxblur_runtime.zig vblur; here
    pass p's output feeds pass p+1 without touching HBM).

    The slab lives in VIRTUAL global row coordinates [s0, s0 + L) with
    s0 = i0 - kblk*64 (may extend past either plane edge).  Positions whose
    nominal row is outside [0, hgt) hold garbage (clamped / partial-block
    views), but every weight is masked to source rows in [0, hgt) and the
    duplicate-edge mirror closes windows at the plane edges, so garbage can
    only reach output positions that are themselves outside [0, hgt) or
    inside the kblk*64 >= passes*radius halo that is never stored.

    The reference's fixed point is the running scheme
    ``out = (C0 + inv2*(W - W0)) >> 16`` anchored at the PLANE's row 0, and
    each pass's W0 depends on the previous pass's output there — so every
    block also carries a (TOPH, w) top-of-plane chain (cheap: 2 strips per
    pass) to reproduce W0/C0 exactly."""
    heads = rest[: kblk]
    tails = rest[kblk : 2 * kblk]
    top_ref = rest[2 * kblk]
    o_ref = rest[2 * kblk + 1]
    r = radius
    w = main_ref.shape[-1]
    i0 = pl.program_id(1) * jnp.int32(th)
    s0 = i0 - jnp.int32(kblk * 64)

    cur = jnp.concatenate(
        [h[0].astype(jnp.int32) for h in heads]
        + [main_ref[0].astype(jnp.int32)]
        + [t[0].astype(jnp.int32) for t in tails],
        axis=0,
    )  # (L, w) i32, slab position s <-> global row s0 + s
    top = top_ref[0].astype(jnp.int32)  # (TOPH, w), global rows [0, TOPH)
    for _ in range(passes):
        tw = _v_window_sums(top, jnp.int32(0), r, hgt, wide)
        w0 = jax.lax.slice(tw, (0, 0), (1, w))
        c0h, c0l = _c0_u32(w0, inv)
        top = _fixed_out(tw - w0, c0h, c0l, inv2)
        wsum = _v_window_sums(cur, s0, r, hgt, wide)
        cur = _fixed_out(wsum - w0, c0h, c0l, inv2)
    o_ref[0] = cur[kblk * 64 : kblk * 64 + th].astype(o_ref.dtype)


def _rt_v_multi_whole_kernel(x_ref, o_ref, *, radius: int, passes: int,
                             hgt: int, inv: int, inv2: int, wide: bool):
    """Whole-plane variant: the slab IS the plane, so there is no halo
    redundancy and the W0/C0 anchor (plane row 0) is in-slab — the matmul
    count equals `passes` independent single-pass kernels while HBM sees
    one read and one write."""
    cur = x_ref[0].astype(jnp.int32)
    w = cur.shape[-1]
    for _ in range(passes):
        wsum = _v_window_sums(cur, jnp.int32(0), radius, hgt, wide)
        w0 = jax.lax.slice(wsum, (0, 0), (1, w))
        c0h, c0l = _c0_u32(w0, inv)
        cur = _fixed_out(wsum - w0, c0h, c0l, inv2)
    o_ref[0] = cur.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rt_blur_v_multi_pallas(x, radius: int, passes: int, tile_h: int = 256):
    """All `passes` runtime-path vertical passes in one kernel (one HBM
    round trip), bit-exact to `passes` sequential jnp running-sum passes.
    Requires passes * radius <= 128.  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    # whole-plane path: slab + byte splits + window sums in VMEM; i32 slab
    # at 4 B/px plus two bf16 splits and the i32 sums ~= 20 B/px
    if (h + ((-h) % 64)) * w * 20 <= 64 * 1024 * 1024:
        hpad = (-h) % 64
        xp = x
        if hpad:
            xp = jnp.concatenate(
                [x, jnp.zeros((n, hpad, w), x.dtype)], axis=1)
        r = radius
        ksize = 2 * r + 1
        kern = functools.partial(
            _rt_v_multi_whole_kernel, radius=r, passes=passes, hgt=h,
            inv=((1 << 32) + r) // ksize, inv2=(((1 << 32) + r) // ksize) >> 16,
            wide=(x.dtype.itemsize == 2),
        )
        zero = np.int32(0)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, h + hpad, w), x.dtype),
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h + hpad, w), lambda i: (i, zero, zero),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, h + hpad, w), lambda i: (i, zero, zero),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp)
        return out[:, :h, :] if hpad else out
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    th = _pick_tile(h, tile_h)
    kblk = -((passes * r) // -64)
    assert kblk <= 2, "fused multi-pass V needs passes*radius <= 128"
    # the top-of-plane W0 chain needs r+1 valid rows after passes-1 shrinks
    assert min(h, _TOPH) >= passes * r + 1, "plane too short for W0 chain"
    num_blocks = pl.cdiv(h, th)
    q = np.int32(th // 64)
    # last 64-row block index that still contains row h-1
    qmx = np.int32((h - 1) // 64)
    zero = np.int32(0)

    kern = functools.partial(
        _rt_v_multi_kernel, radius=r, passes=passes, hgt=h, th=th,
        kblk=kblk, inv=inv, inv2=inv >> 16, wide=(x.dtype.itemsize == 2),
    )
    head_specs = [
        pl.BlockSpec(
            (1, 64, w),
            functools.partial(
                lambda i, j, k: (i, jnp.maximum(j * q - np.int32(k), zero),
                                 zero),
                k=kblk - v,
            ),
            memory_space=pltpu.VMEM,
        )
        for v in range(kblk)
    ]
    tail_specs = [
        pl.BlockSpec(
            (1, 64, w),
            functools.partial(
                lambda i, j, k: (i, jnp.minimum(j * q + q + np.int32(k), qmx),
                                 zero),
                k=v,
            ),
            memory_space=pltpu.VMEM,
        )
        for v in range(kblk)
    ]
    top_spec = pl.BlockSpec((1, _TOPH, w), lambda i, j: (i, zero, zero),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        grid=(n, num_blocks),
        in_specs=[pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM)]
        + head_specs + tail_specs + [top_spec],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
    )(x, *([x] * (2 * kblk + 1)))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def rt_blur_h_pallas(x, radius: int, tile_h: int = 256, passes: int = 1):
    """Runtime-path horizontal pass(es) (duplicate-edge mirror), bit-exact
    to the jnp running-sum formulation.  All `passes` iterations run inside
    one kernel (rows need no halo).  x: (N, H, W) uint8/uint16."""
    n, h, w = x.shape
    r = radius
    ksize = 2 * r + 1
    inv = ((1 << 32) + r) // ksize
    inv2 = inv >> 16
    th = _pick_tile(h, tile_h)
    num_blocks = pl.cdiv(h, th)
    kern = functools.partial(_rt_h_kernel, radius=r, th=th, inv=inv, inv2=inv2,
                             wide=(x.dtype.itemsize == 2), passes=passes)
    zero = np.int32(0)
    hw = _h_weights_dev(w, r)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        grid=(n, num_blocks),
        in_specs=[pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(hw.shape, lambda i, j: (zero, zero),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
    )(x, hw)
