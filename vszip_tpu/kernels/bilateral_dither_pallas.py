"""Fused Pallas TPU kernels for BilateralDither (dense + sub-sampled).

The flat-kernel bilateral (reference src/filters/bilateral_dither.zig:34-213)
evaluates, per pixel, window taps with weight ``clamp(m - |ref_diff|, 0,
wmax)``.  As jnp that is one HBM pass per tap; here each grid step loads a
row-tile plus halo into VMEM and runs every tap in registers — one read and
one write of the plane.  Taps run inside a `fori_loop` whose offsets become
dynamic `pltpu.roll`s of the VMEM slab (a fully unrolled tap chain would
exceed Mosaic's scoped-VMEM stack, which does not reuse buffers).

Dense taps accumulate in the reference's (dy, dx) row-major order and the
sub-sampled path in point-list order, so the f32 sums are bit-identical to
the jnp paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAIL = 64  # slim tail-view height; bounds rv <= 32


def _store(o_ref, p, peak: float, is_int: bool):
    if is_int:
        p = jnp.floor(jnp.clip(p, 0.0, jnp.float32(peak)) + jnp.float32(0.5))
        # Mosaic has no f32->u8/u16 cast; hop through i32
        o_ref[0] = p.astype(jnp.int32).astype(o_ref.dtype)
    else:
        o_ref[0] = p.astype(o_ref.dtype)


def _shifted(slab, dy, dx, nslab: int, wp: int, th: int, w: int):
    """slab rows/lanes cyclically left-shifted by (dy, dx), cropped to
    (th, w) — i.e. slab[dy : dy+th, dx : dx+w] for 0 <= dy <= 2rv,
    0 <= dx <= 2rh (no wrap reaches the crop)."""
    rs = pltpu.roll(slab, jnp.int32(nslab) - dy, 0)
    rs = pltpu.roll(rs, jnp.int32(wp) - dx, 1)
    return jax.lax.slice(rs, (0, 0), (th, w))


def _dense_kernel(m0_ref, t0_ref, m1_ref, t1_ref, o_ref, *, rh: int, rv: int,
                  m: float, wmax: float, swmin: float, peak: float,
                  is_int: bool, has_ref: bool, th: int, w: int):
    halo = min((2 * rv + 7) & ~7, _TAIL)  # 8-aligned for sublane rolls
    slab = jnp.concatenate([m0_ref[0], t0_ref[0, :halo, :]], axis=0)
    rslab = (jnp.concatenate([m1_ref[0], t1_ref[0, :halo, :]], axis=0)
             if has_ref else slab)
    nslab, wp = slab.shape
    cen = jax.lax.slice(slab, (rv, rh), (rv + th, rh + w))
    cen_ref = (jax.lax.slice(rslab, (rv, rh), (rv + th, rh + w))
               if has_ref else cen)

    # The row loop advances the slab one sublane per dy (a dynamic roll);
    # the column taps are STATIC lane slices of the advanced view, unrolled
    # in the loop body (2rh-1 slices compile once for all dy iterations —
    # the earlier per-tap lane roll moved the whole (th, wp) view 2rh-1
    # times per row).  Accumulation order matches the reference's (dy, dx)
    # row-major order, so f32 sums stay bit-identical.
    zeros = jnp.zeros((th, w), jnp.float32)

    def dy_body(dy, carry):
        if has_ref:
            s, sw, rs, rrs = carry
        else:
            s, sw, rs = carry
        rs = pltpu.roll(rs, jnp.int32(nslab - 1), 0)
        if has_ref:
            rrs = pltpu.roll(rrs, jnp.int32(nslab - 1), 0)
        for dx in range(1, 2 * rh):
            v = jax.lax.slice(rs, (0, dx), (th, dx + w))
            vr = jax.lax.slice(rrs, (0, dx), (th, dx + w)) if has_ref else v
            wgt = jnp.maximum(
                jnp.minimum(jnp.float32(m) - jnp.abs(vr - cen_ref),
                            jnp.float32(wmax)), 0.0)
            s = s + (v - cen) * wgt
            sw = sw + wgt
        return (s, sw, rs, rrs) if has_ref else (s, sw, rs)

    init = (zeros, zeros, slab, rslab) if has_ref else (zeros, zeros, slab)
    res = jax.lax.fori_loop(jnp.int32(1), jnp.int32(2 * rv), dy_body, init)
    s, sw = res[0], res[1]
    _store(o_ref, cen + s / jnp.maximum(sw, jnp.float32(swmin)), peak, is_int)


def _subspl_kernel(m0_ref, t0_ref, m1_ref, t1_ref, lid_ref, dyx_ref, o_ref, *,
                   nbr: int, k: int, rh: int, rv: int, m: float, wmax: float,
                   swmin: float, peak: float, is_int: bool, has_ref: bool,
                   th: int, w: int, pts=None):
    halo = min((2 * rv + 7) & ~7, _TAIL)  # 8-aligned for sublane rolls
    slab = jnp.concatenate([m0_ref[0], t0_ref[0, :halo, :]], axis=0)
    rslab = (jnp.concatenate([m1_ref[0], t1_ref[0, :halo, :]], axis=0)
             if has_ref else slab)
    nslab, wp = slab.shape
    cen = jax.lax.slice(slab, (rv, rh), (rv + th, rh + w))
    cen_ref = (jax.lax.slice(rslab, (rv, rh), (rv + th, rh + w))
               if has_ref else cen)
    lid = lid_ref[0]

    if pts is not None:
        # offsets are host constants: every (list, tap) view is a STATIC
        # slice of the slab, chained with selects on the per-pixel list id
        # (the roll form moved the whole slab twice per (list, tap) pair)
        s = sw = jnp.zeros((th, w), jnp.float32)
        for j in range(k):
            v = vr = None
            for t in range(nbr):
                dy, dx = pts[t][j]
                sl = jax.lax.slice(
                    slab, (dy + rv, dx + rh), (dy + rv + th, dx + rh + w))
                sel = lid == t
                v = sl if v is None else jnp.where(sel, sl, v)
                if has_ref:
                    rsl = jax.lax.slice(
                        rslab, (dy + rv, dx + rh),
                        (dy + rv + th, dx + rh + w))
                    vr = rsl if vr is None else jnp.where(sel, rsl, vr)
            if not has_ref:
                vr = v
            wgt = jnp.maximum(
                jnp.minimum(jnp.float32(m) - jnp.abs(vr - cen_ref),
                            jnp.float32(wmax)), 0.0)
            s = s + (v - cen) * wgt
            sw = sw + wgt
        _store(o_ref, cen + s / jnp.maximum(sw, jnp.float32(swmin)), peak,
               is_int)
        return

    def tap(j, carry):
        s, sw = carry

        def lsel(t, vv):
            v, vr = vv
            # point-list t, tap j: offsets from the SMEM-resident table
            dy = dyx_ref[0, t, j] + jnp.int32(rv)
            dx = dyx_ref[1, t, j] + jnp.int32(rh)
            sel = lid == t
            v = jnp.where(sel, _shifted(slab, dy, dx, nslab, wp, th, w), v)
            if has_ref:
                vr = jnp.where(
                    sel, _shifted(rslab, dy, dx, nslab, wp, th, w), vr)
            return v, vr

        zeros = jnp.zeros((th, w), jnp.float32)
        v, vr = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nbr), lsel, (zeros, zeros))
        if not has_ref:
            vr = v
        wgt = jnp.maximum(
            jnp.minimum(jnp.float32(m) - jnp.abs(vr - cen_ref),
                        jnp.float32(wmax)), 0.0)
        return s + (v - cen) * wgt, sw + wgt

    zeros = jnp.zeros((th, w), jnp.float32)
    s, sw = jax.lax.fori_loop(jnp.int32(0), jnp.int32(k), tap, (zeros, zeros))
    _store(o_ref, cen + s / jnp.maximum(sw, jnp.float32(swmin)), peak, is_int)


def _padded(xpad, rpad_or_none, rv: int, th: int):
    """bottom-pad so main blocks and slim tail views stay well-defined, and
    lane-pad to a 128 multiple (dynamic rolls need aligned shapes)."""
    n, hp_, wp_ = xpad.shape
    h = hp_ - 2 * rv
    nb = pl.cdiv(h, th)
    extra = max(nb * th + _TAIL - hp_, 0)
    lpad = (-wp_) % 128

    def pad(a):
        if extra:
            a = jnp.concatenate(
                [a, jnp.zeros((n, extra, a.shape[2]), a.dtype)], axis=1)
        if lpad:
            a = jnp.concatenate(
                [a, jnp.zeros((n, a.shape[1], lpad), a.dtype)], axis=2)
        return a

    xpad = pad(xpad)
    rpad_or_none = None if rpad_or_none is None else pad(rpad_or_none)
    return xpad, rpad_or_none, h, nb


def _specs(th: int, wp_: int, rows: int):
    zero = np.int32(0)
    qmx = np.int32((rows - 1) // _TAIL)
    main = pl.BlockSpec((1, th, wp_), lambda i, j: (i, j, zero),
                        memory_space=pltpu.VMEM)
    tail = pl.BlockSpec(
        (1, _TAIL, wp_),
        lambda i, j: (i, jnp.minimum(j + np.int32(1), qmx), zero),
        memory_space=pltpu.VMEM,
    )
    return main, tail


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def dense_blur_pallas(xpad, rpad_or_none, rh: int, rv: int, m: float,
                      wmax: float, swmin: float, peak: float, is_int: bool,
                      out_dtype):
    """xpad: (N, H+2rv, W+2rh) f32 mirror-padded cache (and the optional
    joint-ref cache of the same shape).  Returns (N, H, W) out_dtype."""
    n, _, wp_ = xpad.shape
    has_ref = rpad_or_none is not None
    th = 64
    xpad, rp, h, nb = _padded(xpad, rpad_or_none, rv, th)
    w = wp_ - 2 * rh
    kern = functools.partial(
        _dense_kernel, rh=rh, rv=rv, m=m, wmax=wmax, swmin=swmin, peak=peak,
        is_int=is_int, has_ref=has_ref, th=th, w=w,
    )
    main, tail = _specs(th, xpad.shape[2], xpad.shape[1])
    zero = np.int32(0)
    rsrc = rp if has_ref else xpad
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), out_dtype),
        grid=(n, nb),
        in_specs=[main, tail, main, tail],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
        # the unrolled static dx slices keep 2rh-1 tap views live per row
        # pass; raise Mosaic's default 16M scoped-vmem cap (v5e has 128M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xpad, xpad, rsrc, rsrc)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def subspl_blur_pallas(xpad, rpad_or_none, list_plane, dyx, rh: int, rv: int,
                       m: float, wmax: float, swmin: float, peak: float,
                       is_int: bool, out_dtype, static_pts=None):
    """Sub-sampled path: per-pixel tap addresses come from one of NBR
    precomputed point lists (reference bilateral_dither_subspl.zig); each
    tap is a select over the lists instead of a flat gather.
    dyx: (2, NBR, k) int32 offsets; list_plane: (1, H, W) int32 ids."""
    n, _, wp_ = xpad.shape
    has_ref = rpad_or_none is not None
    th = 64
    xpad, rp, h, nb = _padded(xpad, rpad_or_none, rv, th)
    w = wp_ - 2 * rh
    _, nbr, k = dyx.shape
    # static offsets allow the fully-unrolled static-slice form; cap the
    # unroll so giant configurations keep the bounded roll loop
    # Mosaic compile time grows superlinearly with the unroll size, but the
    # static form is ~8x faster per tap (r16 default: 147 -> ~600 fps), so
    # the cap sits well above the default r=16 config's 23*30 pairs
    pts = None
    if static_pts is not None and nbr * k <= 800:
        pts = static_pts
    kern = functools.partial(
        _subspl_kernel, nbr=nbr, k=k, rh=rh, rv=rv, m=m, wmax=wmax,
        swmin=swmin, peak=peak, is_int=is_int, has_ref=has_ref, th=th, w=w,
        pts=pts,
    )
    main, tail = _specs(th, xpad.shape[2], xpad.shape[1])
    zero = np.int32(0)
    lid = pl.BlockSpec((1, th, w), lambda i, j: (zero, j, zero),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(dyx.shape, lambda i, j: (zero, zero, zero),
                       memory_space=pltpu.SMEM)
    rsrc = rp if has_ref else xpad
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w), out_dtype),
        grid=(n, nb),
        in_specs=[main, tail, main, tail, lid, tab],
        out_specs=pl.BlockSpec((1, th, w), lambda i, j: (i, j, zero),
                               memory_space=pltpu.VMEM),
        # the static-slice unroll keeps many small tap views live at once;
        # Mosaic's default 16M scoped-vmem cap is far below the physical
        # VMEM, so raise it for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xpad, xpad, rsrc, rsrc, list_plane, dyx)
