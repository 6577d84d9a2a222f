"""Fully fused Pallas TPU kernel for EEDI3's per-line pipeline (non-hp).

Reference: src/filters/eedi3.zig interpLine (cost matrix -> Viterbi DP ->
backtrack -> directional 4-tap interpolation).  The XLA formulation
materializes the (tpitch, B, L, W) cost tensor (~2.7 GB at the benchmark
shape) in HBM, scans it, and re-reads padded rows 41 times for the
directional selects; this kernel keeps everything for a block of lines in
VMEM: the cost matrix (f32) and backtrack matrix (i8) never touch HBM.

Layout: lines ride the lane axis (NL per block), the x axis rides
sublanes, so every direction/window shift in the cost build and every
directional tap in the interpolation is a static sublane slice, and the
x-sequential DP is a fori_loop whose state is a (TPP, NL) register tile.

Bit-exactness: every f32 expression mirrors the XLA path's operation
order (`ops/eedi3.py _costs_nonhp/_dp/_output_nonhp`); selects are one-hot
sums whose masked terms are exact zeros, so no rounding is introduced.
The x axis is padded to an 8-step multiple; backtrack deltas for padded
steps (x >= w) are forced to zero so the walk enters x = w-1 with f = 0,
exactly like a w-length backtrack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(np.finfo(np.float32).max * 0.9)  # FLT_MAX_09
PAD = 96  # must match ops/eedi3.py PAD
_XC = 8  # DP steps per chunk (sublane tile)


def _nofma(x):
    """Round-trip bitcast: blocks Mosaic from contracting the preceding
    multiply into an FMA.  The XLA path (CPU and TPU backends agree bit
    for bit) evaluates these expressions as separate mul + add; a fused
    multiply-add shifts costs by ulps, which flips Viterbi tie-breaks on
    smooth content (measured: 17% of fpath entries on photographic data).
    """
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32), jnp.float32)


def _fused_kernel(r3p_ref, r1p_ref, r1n_ref, r3n_ref, *refs, w: int,
                  wk: int, mdis: int, nrad: int, alpha: float, beta: float,
                  omab: float, gamma: float, nl: int, use_mask: bool,
                  segs: tuple):
    if use_mask:
        bm_ref, o_ref, fp_ref, costs_ref, piT_ref, fpath_ref = refs
    else:
        o_ref, fp_ref, costs_ref, piT_ref, fpath_ref = refs
        bm_ref = None
    tp = 2 * mdis + 1
    tpp = costs_ref.shape[0]
    ncols = costs_ref.shape[1]
    ext = 2 * mdis
    xc = _XC
    rr = 2 * mdis + nrad  # widest tb offset the window sums reach

    r3p = r3p_ref[...]
    r1p = r1p_ref[...]
    r1n = r1n_ref[...]
    r3n = r3n_ref[...]

    # ---- cost build: one (swk, NL) tile per direction u per x segment ----
    # (segments keep the cost scratch bounded: only one segment's costs
    # live in VMEM; the packed backtrack spans the whole line)
    zext = jnp.zeros((ext, nl), jnp.float32)
    r1p_e = jnp.concatenate([zext, r1p, zext], axis=0)
    r1n_e = jnp.concatenate([zext, r1n, zext], axis=0)
    r3n_e = jnp.concatenate([zext, r3n, zext], axis=0)

    def at(x_p, off, x0, swk):  # padded row at data offset `off`, (swk, NL)
        return jax.lax.slice(
            x_p, (PAD + off + x0, 0), (PAD + off + x0 + swk, nl))

    # scratch x layout: segment-local x lives at scratch row x - x0 + 7, so
    # the DP's dynamic chunk reads (x = 1 + c*8 .. +8) hit 8-aligned sublanes
    def build_segment(c0: int, segc: int):
        x0 = xc * c0
        swk = xc * segc + 1
        p0 = x0 + PAD - rr  # padded coord of the tb window start (rr <= PAD)
        plen = swk + 2 * rr

        def res(x_p):  # restrict a padded row to the tb window
            return jax.lax.slice(x_p, (p0, 0), (p0 + plen, nl))

        def shr(x_e, t):  # restricted value at padded position j - t
            return jax.lax.slice(
                x_e, (ext - t + p0, 0), (ext - t + p0 + plen, nl))

        r3p_r, r1p_r, r1n_r = res(r3p), res(r1p), res(r1n)
        blen = plen - 2 * nrad
        for u in range(-mdis, mdis + 1):
            tu = 2 * u
            tb = (jnp.abs(r3p_r - shr(r1p_e, tu))
                  + jnp.abs(r1p_r - shr(r1n_e, tu))
                  + jnp.abs(r1n_r - shr(r3n_e, tu)))

            # three separate window sums (reference costBlockDirect
            # sw0/sw1/sw2, src/filters/eedi3.zig:326-333): one shared
            # k-ascending box ladder, then three slices — bit-identical to
            # the reference accumulation and ~3x fewer slice+adds than the
            # per-k regrouping
            bx = None
            for k in range(-nrad, nrad + 1):
                sh = jax.lax.slice(tb, (nrad + k, 0), (nrad + k + blen, nl))
                bx = sh if bx is None else bx + sh

            def b_at(off, bx=bx):
                return jax.lax.slice(
                    bx, (rr - nrad + off, 0), (rr - nrad + off + swk, nl))

            s = (b_at(u) + b_at(0)) + b_at(tu)
            ip = _nofma((at(r1p, u, x0, swk) + at(r1n, -u, x0, swk))
                        * jnp.float32(0.5))
            v = (jnp.abs(at(r1p, 0, x0, swk) - ip)
                 + jnp.abs(at(r1n, 0, x0, swk) - ip))
            cost_u = (_nofma(jnp.float32(alpha) * s)
                      + jnp.float32(beta * abs(u))
                      + _nofma(jnp.float32(omab) * v))
            costs_ref[u + mdis, 7 : 7 + swk, :] = cost_u

    for t in range(tp, tpp):
        costs_ref[t] = jnp.full((ncols, nl), BIG, jnp.float32)

    # ---- DP forward (x = 1 .. wk-1), xc steps per chunk ----
    nchunks = (wk - 1) // xc
    gam = jnp.float32(gamma)
    big1 = jnp.full((1, nl), BIG, jnp.float32)

    def step(pcost, tcx):
        pcat = jnp.concatenate([big1, pcost, big1], axis=0)
        left = jax.lax.slice(pcat, (0, 0), (tpp, nl)) + gam
        cent = jax.lax.slice(pcat, (1, 0), (tpp + 1, nl))
        right = jax.lax.slice(pcat, (2, 0), (tpp + 2, nl)) + gam
        lw = left < cent
        bval = jnp.where(lw, left, cent)
        # Mosaic's i8 lowering recurses on this backend: keep the backtrack
        # delta in i32 and 2-bit-pack the chunk's xc steps into ONE word
        bd = jnp.where(lw, jnp.int32(0), jnp.int32(1))  # delta + 1
        rw = right < bval
        bval = jnp.where(rw, right, bval)
        bd = jnp.where(rw, jnp.int32(2), bd)
        return jnp.minimum(bval + tcx, BIG), bd

    def fwd_seg(c0: int):
        def fwd_chunk(cl, carry):
            pcost, prev_bd = carry
            c = cl + jnp.int32(c0)  # global chunk index
            s0 = jnp.int32(8) + cl * jnp.int32(xc)  # local row of x0 = 1+c*xc
            tcs = costs_ref[:, pl.ds(s0, xc), :]  # (TPP, xc, NL)
            # the mask shares the x-at-row-x+7 layout (global), so this
            # read is 8-aligned
            bms = (bm_ref[pl.ds(jnp.int32(8) + c * jnp.int32(xc), xc)]
                   if use_mask else None)  # (xc, NL) i32
            word = jnp.zeros((tpp, nl), jnp.int32)
            for k in range(xc):
                tcx = tcs[:, k, :]
                new_pcost, bd = step(pcost, tcx)
                if use_mask:
                    # inactive x: carry costs/backtrack through; at x==1
                    # reset (reference _dp mclip gating).  Broadcast the i32
                    # mask BEFORE comparing: Mosaic's i1 broadcast lowering
                    # recurses
                    is_x1 = (c == 0) & (k == 0)
                    inactive = jnp.broadcast_to(
                        bms[k : k + 1, :], (tpp, nl)) == 0
                    reset = jnp.where(is_x1, tcx, pcost)
                    new_pcost = jnp.where(inactive, reset, new_pcost)
                    bd = jnp.where(
                        inactive,
                        jnp.where(is_x1, jnp.int32(1), prev_bd), bd)
                pcost = new_pcost
                prev_bd = bd
                # padded steps (x >= w) must contribute zero backtrack delta
                bd = jnp.where(
                    jnp.int32(1 + k) + c * jnp.int32(xc) < jnp.int32(w),
                    bd, jnp.int32(1))
                word = word | (bd << (2 * k))
            piT_ref[c] = word
            return pcost, prev_bd
        return fwd_chunk

    carry = None
    for c0, segc in segs:
        build_segment(c0, segc)
        if c0 == 0:
            # cost at x=0 sits at row 7 of segment 0; pad rows hold BIG
            carry = (costs_ref[:, 7, :], jnp.zeros((tpp, nl), jnp.int32))
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(segc), fwd_seg(c0), carry)

    # ---- backtrack (reverse): fpath[x] = f(x+1) + piT[x+1][mdis+f(x+1)] ----
    # f stays in f32 (exact for |f| <= mdis): cross-sublane i32 reduces and
    # narrow-int converts both hit Mosaic lowering gaps on this backend
    trow = jax.lax.broadcasted_iota(
        jnp.int32, (tpp, nl), 0).astype(jnp.float32)

    def back_chunk(ci, f):
        c = jnp.int32(nchunks - 1) - ci
        word = piT_ref[c]  # (TPP, NL) i32, 2 bits per step
        fs = []
        for k in reversed(range(xc)):
            onehot = trow == (f + jnp.float32(mdis))  # f is (1, NL) f32
            dd = (((word >> (2 * k)) & jnp.int32(3))
                  - jnp.int32(1)).astype(jnp.float32)
            delta = jnp.sum(jnp.where(onehot, dd, 0.0),
                            axis=0, keepdims=True)
            f = f + delta
            fs.append(f)
        fpath_ref[pl.ds(c * jnp.int32(xc), xc)] = jnp.concatenate(
            fs[::-1], axis=0)
        return f

    f0 = jnp.zeros((1, nl), jnp.float32)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), back_chunk, f0)
    fpath_ref[wk - 1 : wk] = jnp.zeros((1, nl), jnp.float32)

    # ---- directional interpolation (one-hot over fv, masks shared) ----
    fpath = fpath_ref[...].astype(jnp.int32)
    if use_mask:
        # mask is 0/1 i32; a multiply avoids a bool conversion that
        # recurses in this Mosaic lowering
        fpath = fpath * bm_ref[7 : 7 + wk]
    zero = jnp.zeros((wk, nl), jnp.float32)
    g1p = g1n = g3p = g3n = zero
    for fv in range(-mdis, mdis + 1):
        m = fpath == fv
        g1p = g1p + jnp.where(m, at(r1p, fv, 0, wk), 0.0)
        g1n = g1n + jnp.where(m, at(r1n, -fv, 0, wk), 0.0)
        g3p = g3p + jnp.where(m, at(r3p, 3 * fv, 0, wk), 0.0)
        g3n = g3n + jnp.where(m, at(r3n, -3 * fv, 0, wk), 0.0)
    four_tap = (jnp.float32(0.5625) * (g1p + g1n)
                - jnp.float32(0.0625) * (g3p + g3n))
    two_tap = (g1p + g1n) * jnp.float32(0.5)
    ad3 = jnp.abs(fpath) * 3
    xs = jax.lax.broadcasted_iota(jnp.int32, (wk, nl), 0)
    ok = (xs >= ad3) & (xs + ad3 <= w - 1)
    o_ref[...] = jnp.where(ok, four_tap, two_tap)
    fp_ref[...] = fpath


def _nl_for(w: int, tpp: int) -> int:
    """Lines per block: big enough to amortize the DP's per-step overhead,
    small enough that costs (f32) + packed piT + the cost-build/interp live
    values fit VMEM (the live-value stack runs ~25 MB on top of the
    scratch; 56 MB of scratch at w=1080 OOMed the 110 MB budget at
    nl=256)."""
    budget = 56 * 1024 * 1024
    per = max(w, 1) * (tpp * 4 + tpp // 2)  # f32 costs + packed piT words
    nl = budget // per
    return int(max(128, min(512, nl // 128 * 128)))


_SEG_BUDGET = 56 * 1024 * 1024  # cost-scratch bytes per x segment


def _seg_plan(wk: int, tpp: int, nl: int) -> tuple:
    """Split the DP's chunk range into x segments whose cost scratch fits
    the budget (one segment's costs live in VMEM at a time; the packed
    backtrack words span the whole line).  Returns ((c0, segc), ...)."""
    nchunks = (wk - 1) // _XC
    per_chunk = tpp * _XC * nl * 4
    segc_max = max(8, _SEG_BUDGET // per_chunk - 1)
    nseg = -(nchunks // -segc_max)
    segc = -(nchunks // -nseg)
    segs, c0 = [], 0
    while c0 < nchunks:
        sc = min(segc, nchunks - c0)
        segs.append((c0, sc))
        c0 += sc
    return tuple(segs)


def fused_fits(w: int, mdis: int, hp: bool) -> bool:
    """Whole-line state (packed backtrack + interp accumulators + padded
    input rows) plus one x segment's cost scratch must fit the VMEM budget
    (giant widths, e.g. 4K hp columns, still fall back to the XLA path)."""
    tp = (4 if hp else 2) * mdis + 1
    tpp = -(tp // -8) * 8
    wk = -((w - 1) // -_XC) * _XC + 1
    nl = _nl_for(w, tpp)
    segs = _seg_plan(wk, tpp, nl)
    segc_max = max(sc for _, sc in segs)
    nchunks = (wk - 1) // _XC
    costs = tpp * (_XC * segc_max + 8) * nl * 4
    pit = nchunks * tpp * nl * 4
    interp = (8 if hp else 4) * wk * nl * 4
    fixed = 35 * 1024 * 1024  # inputs, hp rows, live values
    return costs + pit + interp + fixed <= 105 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def eedi3_fused_pallas(r3p, r1p, r1n, r3n, w: int, mdis: int, nrad: int,
                       alpha: float, beta: float, gamma: float,
                       omab: float | None = None, bmask=None):
    """Fused cost+DP+backtrack+interp.  Inputs: (B, L, w + 2*PAD) f32
    padded rows; optional (B, L, w) bool mclip gate (reference _dp mclip
    semantics).  Returns (out, fpath): (B, L, w) f32 / i32.

    `omab` is the reference's one_minus_ab = 1 - alpha - beta computed from
    the UNSCALED user alpha/beta (src/vapoursynth/eedi3.zig:465 assigns it
    BEFORE the alpha /= 3 scaling at :466); the `alpha`/`beta` arguments
    here are the scaled cost coefficients, so omab cannot be derived from
    them and must be supplied by the caller.  A None default (1-alpha-beta)
    is only correct when the caller passes unscaled coefficients (the
    kernel-level interpret tests do)."""
    b, l, wp = r3p.shape
    assert wp == w + 2 * PAD
    if omab is None:
        omab = 1.0 - alpha - beta
    tp = 2 * mdis + 1
    tpp = -(tp // -8) * 8
    bl = b * l
    nl = _nl_for(w, tpp)
    blp = -(bl // -nl) * nl
    wk = -((w - 1) // -_XC) * _XC + 1  # wk-1 divisible by the chunk size

    def tr(r):
        rt = jnp.transpose(r.reshape(bl, wp))
        if blp > bl:
            rt = jnp.pad(rt, ((0, 0), (0, blp - bl)))
        if wk > w:
            rt = jnp.pad(rt, ((0, wk - w), (0, 0)))
        return rt

    rows = [tr(r) for r in (r3p, r1p, r1n, r3n)]
    use_mask = bmask is not None
    if use_mask:
        # mask rides the same x-at-row-x+7 layout as the cost scratch so
        # the DP's dynamic chunk reads stay 8-aligned; pad x/lanes inactive
        bt = jnp.transpose(bmask.astype(jnp.int32).reshape(bl, w))
        if blp > bl:
            bt = jnp.pad(bt, ((0, 0), (0, blp - bl)))
        bt = jnp.pad(bt, ((7, wk - w), (0, 0)))
        rows.append(bt)
    wpp = wk + 2 * PAD
    nb = blp // nl

    segs = _seg_plan(wk, tpp, nl)
    segc_max = max(sc for _, sc in segs)
    kern = functools.partial(
        _fused_kernel, w=w, wk=wk, mdis=mdis, nrad=nrad, alpha=alpha,
        beta=beta, omab=omab, gamma=gamma, nl=nl, use_mask=use_mask,
        segs=segs,
    )
    zero = np.int32(0)
    in_spec = pl.BlockSpec((wpp, nl), lambda i: (zero, i),
                           memory_space=pltpu.VMEM)
    bm_spec = pl.BlockSpec((wk + 7, nl), lambda i: (zero, i),
                           memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((wk, nl), lambda i: (zero, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((wk, nl), lambda i: (zero, i), memory_space=pltpu.VMEM),
    ]
    out, fp = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((wk, blp), jnp.float32),
                   jax.ShapeDtypeStruct((wk, blp), jnp.int32)),
        grid=(nb,),
        in_specs=[in_spec] * 4 + ([bm_spec] if use_mask else []),
        out_specs=out_specs,
        scratch_shapes=[
            # one segment's costs (segment-local x at row x - x0 + 7)
            pltpu.VMEM((tpp, _XC * segc_max + 8, nl), jnp.float32),
            pltpu.VMEM(((wk - 1) // _XC, tpp, nl), jnp.int32),  # packed piT
            pltpu.VMEM((wk, nl), jnp.float32),           # fpath (small ints)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*rows)
    out = jnp.transpose(out[:w, :bl]).reshape(b, l, w)
    fp = jnp.transpose(fp[:w, :bl]).reshape(b, l, w)
    return out, fp


def _fused_kernel_hp(r3p_ref, r1p_ref, r1n_ref, r3n_ref, o_ref, fp_ref,
                     costs_ref, piT_ref, fpath_ref, *, w: int, wk: int,
                     mdis: int, nrad: int, alpha: float, beta: float,
                     omab: float, gamma: float, nl: int, segs: tuple):
    """Half-pel variant (reference interpLineHP): 4*mdis+1 directions over
    full- and half-pel rows, +-2 DP transitions (3-bit-packed backtrack),
    8-tap directional interpolation with even/odd sub-pel blending."""
    cen = 2 * mdis
    tp = 2 * cen + 1
    tpp = costs_ref.shape[0]
    ncols = costs_ref.shape[1]
    wpp = wk + 2 * PAD
    ext = cen
    xc = _XC
    rr = cen + nrad  # widest base offset the window sums reach

    r3p = r3p_ref[...]
    r1p = r1p_ref[...]
    r1n = r1n_ref[...]
    r3n = r3n_ref[...]

    def hp_row(a):
        # computeHpRow: out[j] = .5625*(a[j]+a[j+1]) - .0625*(a[j-1]+a[j+2]);
        # row ends are never read by in-range cost/interp offsets
        z2 = jnp.zeros((2, nl), jnp.float32)
        a_e = jnp.concatenate([z2, a, z2], axis=0)

        def att(t):
            return jax.lax.slice(a_e, (2 + t, 0), (2 + t + wpp, nl))

        return (_nofma(jnp.float32(0.5625) * (a + att(1)))
                - _nofma(jnp.float32(0.0625) * (att(-1) + att(2))))

    hpA, hpB, hpC, hpD = (hp_row(r) for r in (r3p, r1p, r1n, r3n))

    zext = jnp.zeros((ext, nl), jnp.float32)

    def extend(x):
        return jnp.concatenate([zext, x, zext], axis=0)

    r1p_e, r1n_e, r3n_e = extend(r1p), extend(r1n), extend(r3n)
    hpB_e, hpC_e, hpD_e = extend(hpB), extend(hpC), extend(hpD)

    def at(x_p, off, x0, swk):
        return jax.lax.slice(
            x_p, (PAD + off + x0, 0), (PAD + off + x0 + swk, nl))

    def build_segment(c0: int, segc: int):
        x0 = xc * c0
        swk = xc * segc + 1
        p0 = x0 + PAD - rr
        plen = swk + 2 * rr

        def res(x_p):
            return jax.lax.slice(x_p, (p0, 0), (p0 + plen, nl))

        def shr(x_e, t):
            return jax.lax.slice(
                x_e, (ext - t + p0, 0), (ext - t + p0 + plen, nl))

        r3p_r, r1p_r, r1n_r = res(r3p), res(r1p), res(r1n)
        hpA_r, hpB_r, hpC_r = res(hpA), res(hpB), res(hpC)
        for u in range(-cen, cen + 1):
            uh = u >> 1
            odd = (u & 1) != 0
            lo0 = (-uh - 1) if odd else -uh
            B0, C0 = (hpB, hpC) if odd else (r1p, r1n)
            base_m = (jnp.abs(r3p_r - shr(r1p_e, u))
                      + jnp.abs(r1p_r - shr(r1n_e, u))
                      + jnp.abs(r1n_r - shr(r3n_e, u)))
            if odd:
                base0 = (jnp.abs(hpA_r - shr(hpB_e, u))
                         + jnp.abs(hpB_r - shr(hpC_e, u))
                         + jnp.abs(hpC_r - shr(hpD_e, u)))
            else:
                base0 = base_m

            # shared k-ascending box ladders (bit-identical to the separate
            # per-x window accumulators), then slices for s1/s2/s0
            blen = plen - 2 * nrad

            def box(b):
                acc = None
                for k in range(-nrad, nrad + 1):
                    sh = jax.lax.slice(b, (nrad + k, 0),
                                       (nrad + k + blen, nl))
                    acc = sh if acc is None else acc + sh
                return acc

            bm_box = box(base_m)
            b0_box = bm_box if not odd else box(base0)

            def b_at(bx, off):
                return jax.lax.slice(
                    bx, (rr - nrad + off, 0), (rr - nrad + off + swk, nl))

            s1 = b_at(bm_box, 0)
            s2 = b_at(bm_box, u)
            s0 = b_at(b0_box, uh)
            ip = _nofma((at(B0, uh, x0, swk) + at(C0, lo0, x0, swk))
                        * jnp.float32(0.5))
            v = (jnp.abs(at(r1p, 0, x0, swk) - ip)
                 + jnp.abs(at(r1n, 0, x0, swk) - ip))
            cost_u = (_nofma(jnp.float32(alpha) * (s0 + s1 + s2))
                      + jnp.float32(beta * abs(u) * 0.5)
                      + _nofma(jnp.float32(omab) * v))
            costs_ref[u + cen, 7 : 7 + swk, :] = cost_u

    for t in range(tp, tpp):
        costs_ref[t] = jnp.full((ncols, nl), BIG, jnp.float32)

    # ---- DP forward: 5 transitions, 3-bit-packed backtrack (bd + 2) ----
    nchunks = (wk - 1) // xc
    big2 = jnp.full((2, nl), BIG, jnp.float32)
    gammas = (gamma, gamma * 0.5, 0.0, gamma * 0.5, gamma)

    def step(pcost, tcx):
        pcat = jnp.concatenate([big2, pcost, big2], axis=0)
        bval = jax.lax.slice(pcat, (0, 0), (tpp, nl)) + jnp.float32(gammas[0])
        bd = jnp.full((tpp, nl), jnp.int32(0))  # delta -2 -> code 0
        for i, g in enumerate(gammas[1:], start=1):
            cv = jax.lax.slice(pcat, (i, 0), (i + tpp, nl))
            if g:
                cv = cv + jnp.float32(g)
            m = cv < bval
            bval = jnp.where(m, cv, bval)
            bd = jnp.where(m, jnp.int32(i), bd)
        return jnp.minimum(bval + tcx, BIG), bd

    def fwd_seg(c0: int):
        def fwd_chunk(cl, pcost):
            c = cl + jnp.int32(c0)
            s0 = jnp.int32(8) + cl * jnp.int32(xc)
            tcs = costs_ref[:, pl.ds(s0, xc), :]
            word = jnp.zeros((tpp, nl), jnp.int32)
            for k in range(xc):
                pcost, bd = step(pcost, tcs[:, k, :])
                bd = jnp.where(
                    jnp.int32(1 + k) + c * jnp.int32(xc) < jnp.int32(w),
                    bd, jnp.int32(2))  # delta 0
                word = word | (bd << (3 * k))
            piT_ref[c] = word
            return pcost
        return fwd_chunk

    pcost = None
    for c0, segc in segs:
        build_segment(c0, segc)
        if c0 == 0:
            pcost = costs_ref[:, 7, :]
        pcost = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(segc), fwd_seg(c0), pcost)

    # ---- backtrack (f32 path values, see non-hp kernel) ----
    trow = jax.lax.broadcasted_iota(
        jnp.int32, (tpp, nl), 0).astype(jnp.float32)

    def back_chunk(ci, f):
        c = jnp.int32(nchunks - 1) - ci
        word = piT_ref[c]
        fs = []
        for k in reversed(range(xc)):
            onehot = trow == (f + jnp.float32(cen))
            dd = (((word >> (3 * k)) & jnp.int32(7))
                  - jnp.int32(2)).astype(jnp.float32)
            delta = jnp.sum(jnp.where(onehot, dd, 0.0),
                            axis=0, keepdims=True)
            f = f + delta
            fs.append(f)
        fpath_ref[pl.ds(c * jnp.int32(xc), xc)] = jnp.concatenate(
            fs[::-1], axis=0)
        return f

    f0 = jnp.zeros((1, nl), jnp.float32)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), back_chunk, f0)
    fpath_ref[wk - 1 : wk] = jnp.zeros((1, nl), jnp.float32)

    # ---- 8-tap interpolation, one-hot over fv (masks shared) ----
    fpath = fpath_ref[...].astype(jnp.int32)
    zero = jnp.zeros((wk, nl), jnp.float32)
    g1p_e = g1n_e = g3p_e = g3n_e = zero
    g3p_o = g1p_o = g1n_o = g3n_o = zero
    for fv in range(-cen, cen + 1):
        m = fpath == fv
        g1p_e = g1p_e + jnp.where(m, at(r1p, fv >> 1, 0, wk), 0.0)
        g1n_e = g1n_e + jnp.where(m, at(r1n, -(fv >> 1), 0, wk), 0.0)
        g3p_e = g3p_e + jnp.where(m, at(r3p, (3 * fv) >> 1, 0, wk), 0.0)
        g3n_e = g3n_e + jnp.where(m, at(r3n, -((3 * fv) >> 1), 0, wk), 0.0)
        g3p_o = g3p_o + jnp.where(m, at(r3p, (3 * fv + 1) >> 1, 0, wk), 0.0)
        g1p_o = g1p_o + jnp.where(m, at(r1p, (fv + 1) >> 1, 0, wk), 0.0)
        g1n_o = g1n_o + jnp.where(m, at(r1n, -((fv + 1) >> 1), 0, wk), 0.0)
        g3n_o = g3n_o + jnp.where(
            m, at(r3n, -((3 * fv + 1) >> 1), 0, wk), 0.0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (wk, nl), 0)
    even = (fpath & 1) == 0
    d2 = fpath >> 1
    ad_e = jnp.abs(d2)
    four_e = (jnp.float32(0.5625) * (g1p_e + g1n_e)
              - jnp.float32(0.0625) * (g3p_e + g3n_e))
    two_e = (g1p_e + g1n_e) * jnp.float32(0.5)
    ok_e = (xs >= ad_e * 3) & (xs + ad_e * 3 <= w - 1)
    out_e = jnp.where(ok_e, four_e, two_e)

    d30 = (3 * fpath) >> 1
    d31 = (3 * fpath + 1) >> 1
    ad_o = jnp.maximum(jnp.abs(d30), jnp.abs(d31))
    c0 = g3p_e + g3p_o
    c1 = g1p_e + g1p_o
    c2 = g1n_e + g1n_o
    c3 = g3n_e + g3n_o
    four_o = (jnp.float32(0.28125) * (c1 + c2)
              - jnp.float32(0.03125) * (c0 + c3))
    two_o = (c1 + c2) * jnp.float32(0.25)
    ok_o = (xs >= ad_o) & (xs + ad_o <= w - 1)
    out_o = jnp.where(ok_o, four_o, two_o)

    o_ref[...] = jnp.where(even, out_e, out_o)
    fp_ref[...] = fpath





@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def eedi3_fused_hp_pallas(r3p, r1p, r1n, r3n, w: int, mdis: int, nrad: int,
                          alpha: float, beta: float, gamma: float,
                          omab: float | None = None):
    """Fused hp pipeline.  Inputs: (B, L, w + 2*PAD) f32 padded rows.
    Returns (out, fpath): (B, L, w) f32 / i32.  See eedi3_fused_pallas for
    the omab contract (must come from the unscaled alpha/beta)."""
    b, l, wp = r3p.shape
    assert wp == w + 2 * PAD
    if omab is None:
        omab = 1.0 - alpha - beta
    tp = 4 * mdis + 1
    tpp = -(tp // -8) * 8
    bl = b * l
    nl = _nl_for(w, tpp)
    blp = -(bl // -nl) * nl
    wk = -((w - 1) // -_XC) * _XC + 1

    def tr(r):
        rt = jnp.transpose(r.reshape(bl, wp))
        if blp > bl:
            rt = jnp.pad(rt, ((0, 0), (0, blp - bl)))
        if wk > w:
            rt = jnp.pad(rt, ((0, wk - w), (0, 0)))
        return rt

    rows = [tr(r) for r in (r3p, r1p, r1n, r3n)]
    wpp = wk + 2 * PAD
    nb = blp // nl

    segs = _seg_plan(wk, tpp, nl)
    segc_max = max(sc for _, sc in segs)
    kern = functools.partial(
        _fused_kernel_hp, w=w, wk=wk, mdis=mdis, nrad=nrad, alpha=alpha,
        beta=beta, omab=omab, gamma=gamma, nl=nl, segs=segs,
    )
    zero = np.int32(0)
    in_spec = pl.BlockSpec((wpp, nl), lambda i: (zero, i),
                           memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((wk, nl), lambda i: (zero, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((wk, nl), lambda i: (zero, i), memory_space=pltpu.VMEM),
    ]
    out, fp = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((wk, blp), jnp.float32),
                   jax.ShapeDtypeStruct((wk, blp), jnp.int32)),
        grid=(nb,),
        in_specs=[in_spec] * 4,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tpp, _XC * segc_max + 8, nl), jnp.float32),
            pltpu.VMEM(((wk - 1) // _XC, tpp, nl), jnp.int32),
            pltpu.VMEM((wk, nl), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*rows)
    out = jnp.transpose(out[:w, :bl]).reshape(b, l, w)
    fp = jnp.transpose(fp[:w, :bl]).reshape(b, l, w)
    return out, fp
