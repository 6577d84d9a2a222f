"""Fused Pallas TPU kernel for Compress (MPEG-2 / JPEG intra pipeline).

Reference: src/filters/compress.zig (bit-faithful FFmpeg islow fdct +
intra quantize/dequantize + simple-idct).  The XLA plane formulation is
HBM-bound: each of the four transform passes re-reads the full i32 plane
once per shifted slice (~15x), so a 1080p batch pays ~30 plane reads.
This kernel loads one (64-row, W) tile into VMEM and runs the whole
fdct -> quant -> dequant -> idct chain in registers — one plane read, one
plane write.

Block structure makes this halo-free: both 1-D transforms operate inside
aligned 8x8 pixel groups, so any tile whose height and width are
multiples of 8 never reads across its boundary.  Every group-of-8
operation (the butterfly matrices, the DC-only-row OR, the DC broadcast)
is expressed as masked lane/sublane shifts against period-8 coefficient
banks precomputed on host:

    out[w] = sum_s coef_s[w] * x[w + s],   coef_s[w] = M[w%8, w%8 + s]

Wrapping i32 accumulation commutes mod 2^32, so results are bit-identical
to the reference's butterfly evaluation order (see ops/compress.py).
The MPEG deadzone's unsigned window test `(lv+T1) u32> T2` is rewritten
signed as `(v < 0) | (v > T2)` (any negative v maps above T2 < 2^31);
the DC truncating division is by a power of two (dc_q in {8,16,32,64})
and becomes sign * (abs >> k).  The i64-wide quantizer regimes (MPEG
qscale=1, JPEG quality >= 92 where some qtab entry is 1) stay on the XLA
path — Mosaic has no 64-bit vector lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 64  # tile rows; callers pad H to a BH multiple (and W to 8)


def _shl(a, s: int, axis: int):
    """out[i] = a[i + s] via a circular roll — every wrapped lane lands on a
    zero in the period-8 coefficient/validity banks, so the wrap is never
    observed (and roll is a single barrel shift vs. a materialized concat).
    Mosaic requires a non-negative shift."""
    if s == 0:
        return a
    n = a.shape[axis]
    return pltpu.roll(a, jnp.int32((n - s) % n), axis)


def _i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _descale(x, n: int):
    return (x + (1 << (n - 1))) >> n


def _sign(x):
    one = jnp.int32(1)
    return jnp.where(x > 0, one, jnp.int32(0)) - jnp.where(
        x < 0, one, jnp.int32(0))


def _limbs(x):
    """i16-range i32 -> (hi, lo) byte-limb bf16 planes (exact: |hi| <= 128,
    lo in [0, 256))."""
    return ((x >> 8).astype(jnp.bfloat16), (x & 255).astype(jnp.bfloat16))


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pass_w(x, cw_ref, base: int):
    """Group-of-8 butterfly along lanes as block-diagonal MXU matmuls.

    The matrix and the i16-range data each split into byte limbs (bf16-
    exact); every f32 partial sum stays < 2^20, and the i32 recombination
    wraps mod 2^32 exactly like the reference's accumulation.  The earlier
    15-tap masked-roll form spent ~45 VPU ops/pixel per pass."""
    bh, w = x.shape
    xh, xl = _limbs(x)
    ch = cw_ref[base]
    cl = cw_ref[base + 1]
    outs = []
    for c0 in range(0, w, 128):
        cn = min(128, w - c0)
        sh = jax.lax.slice(xh, (0, c0), (bh, c0 + cn))
        sl = jax.lax.slice(xl, (0, c0), (bh, c0 + cn))
        mh = jax.lax.slice(ch, (0, 0), (cn, cn))
        ml = jax.lax.slice(cl, (0, 0), (cn, cn))
        hh = _mm(sh, mh)
        mid = _mm(sh, ml) + _mm(sl, mh)
        ll = _mm(sl, ml)
        acc = ((hh.astype(jnp.int32) << 16)
               + (mid.astype(jnp.int32) << 8) + ll.astype(jnp.int32))
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _pass_h(x, ah_ref, base: int):
    """Group-of-8 butterfly along sublanes: one block-diagonal (BH, BH)
    matmul from the left, same limb scheme as _pass_w."""
    xh, xl = _limbs(x)
    mh = ah_ref[base]
    ml = ah_ref[base + 1]
    hh = _mm(mh, xh)
    mid = _mm(ml, xh) + _mm(mh, xl)
    ll = _mm(ml, xl)
    return ((hh.astype(jnp.int32) << 16)
            + (mid.astype(jnp.int32) << 8) + ll.astype(jnp.int32))


def _compress_kernel(x_ref, cw_ref, ch_ref, vw_ref, mw_ref, mh_ref,
                     qa_ref, qb_ref, o_ref, *, codec: str, consts):
    from ..ops.compress import (COL_DC_BIAS, COL_SHIFT, CONST_BITS,
                                PASS1_BITS, ROW_SHIFT, W4)

    x = x_ref[0]  # (BH, W) i32, already level-shifted
    m04w = (mw_ref[0, :] != 0)[None, :]
    dcw = (mw_ref[1, :] != 0)[None, :]
    m04h = (mh_ref[:, 0] != 0)[:, None]
    dch = (mh_ref[:, 1] != 0)[:, None]

    # --- forward DCT ---
    raw = _pass_w(x, cw_ref, 0)
    p1 = _i16(jnp.where(m04w, raw * (1 << PASS1_BITS),
                        _descale(raw, CONST_BITS - PASS1_BITS)))
    raw2 = _pass_h(p1, ch_ref, 0)
    coeff = _i16(jnp.where(m04h, _descale(raw2, PASS1_BITS),
                           _descale(raw2, CONST_BITS + PASS1_BITS)))

    # --- quantize / dequantize ---
    dcm = dch & dcw
    qa = qa_ref[...]
    qb = qb_ref[...]
    if codec == "mpeg2":
        (thresh1, thresh2, bias, qmat_shift, dc_q_log2, dc_scale) = consts
        lv = coeff * qa
        v = lv + jnp.int32(thresh1)
        inrange = (v < 0) | (v > jnp.int32(thresh2))
        q = jnp.where(
            lv > 0,
            (jnp.int32(bias) + lv) >> qmat_shift,
            -((jnp.int32(bias) - lv) >> qmat_shift),
        )
        ac = jnp.where(inrange, q, jnp.int32(0))
        deq_ac = _i16(_sign(ac) * ((jnp.abs(ac) * qb) >> 4))
        dc_lv = coeff + jnp.int32(1 << (dc_q_log2 - 1))
        dc_out = _sign(dc_lv) * (jnp.abs(dc_lv) >> dc_q_log2)
        outq = jnp.where(dcm, _i16(dc_out * jnp.int32(dc_scale)), deq_ac)
    else:
        (bias, qmat_shift) = consts
        lv = coeff * qa
        q = jnp.where(
            lv > 0,
            (jnp.int32(bias) + lv) >> qmat_shift,
            jnp.where(lv < 0, -((jnp.int32(bias) - lv) >> qmat_shift),
                      jnp.int32(0)),
        )
        outq = _i16(q * qb)

    # --- inverse DCT ---
    raw = _pass_w(outq, cw_ref, 2)
    rows = _i16((raw + jnp.int32(1 << (ROW_SHIFT - 1))) >> ROW_SHIFT)
    # DC-only-row fast path: group OR of AC lanes / group sum of the DC lane
    # (the same validity bank serves both: masked shifts over s give every
    # lane its whole group)
    acv = jnp.where(dcw, jnp.int32(0), outq)
    dcv = jnp.where(dcw, outq, jnp.int32(0))
    gor = None
    dcb = None
    for i, s in enumerate(range(-7, 8)):
        vm = vw_ref[i, :][None, :]
        t_or = _shl(acv, s, 1) * vm
        t_dc = _shl(dcv, s, 1) * vm
        gor = t_or if gor is None else gor | t_or
        dcb = t_dc if dcb is None else dcb + t_dc
    rows = jnp.where(gor == 0, _i16(dcb * 8), rows)
    raw2 = _pass_h(rows, ch_ref, 2)
    pix = (raw2 + jnp.int32(W4 * COL_DC_BIAS)) >> COL_SHIFT
    o_ref[0] = pix


@functools.partial(jax.jit, static_argnums=(3, 4, 5), static_argnames=("interpret",))
def compress_plane_pallas(x, qa_tile, qb_tile, codec: str, consts,
                          level: int, interpret: bool = False):
    """x: (N, H, W) uint8 with H % BH == 0, W % 8 == 0.  qa/qb: (BH, W)
    i32 quantizer tiles.  Returns (N, H, W) uint8."""
    from ..ops.compress import _fdct_mat, _idct_mat

    n, h, w = x.shape
    xi = x.astype(jnp.int32) - level  # widen in XLA, not in-kernel

    def blockdiag_limbs(mat, size, right):
        b = np.zeros((size, size), np.int64)
        blk = mat.T if right else mat
        for g in range(0, size, 8):
            b[g : g + 8, g : g + 8] = blk
        hi = (b >> 8).astype(np.float32)
        lo = (b & 255).astype(np.float32)
        return hi, lo

    # 4 stacked (128,128) right-multiply matrices (fdct hi/lo, idct hi/lo)
    # and the (BH,BH) left-multiply set; entries < 2^15 split into byte
    # limbs, bf16-exact
    cw = jnp.asarray(np.stack(
        blockdiag_limbs(_fdct_mat(), 128, True)
        + blockdiag_limbs(_idct_mat(), 128, True)), jnp.bfloat16)
    ch = jnp.asarray(np.stack(
        blockdiag_limbs(_fdct_mat(), BH, False)
        + blockdiag_limbs(_idct_mat(), BH, False)), jnp.bfloat16)

    lanes_w = np.arange(w) % 8
    lanes_h = np.arange(BH) % 8
    vw = np.stack([((lanes_w + s >= 0) & (lanes_w + s < 8)).astype(np.int32)
                   for s in range(-7, 8)])                          # (15, W)
    mw = np.stack([(lanes_w % 4 == 0).astype(np.int32),
                   (lanes_w == 0).astype(np.int32)])                # (2, W)
    mh = np.stack([(lanes_h % 4 == 0).astype(np.int32),
                   (lanes_h == 0).astype(np.int32)], axis=1)        # (BH, 2)

    kern = functools.partial(_compress_kernel, codec=codec, consts=consts)
    zero = np.int32(0)  # literal 0 traces as i64 under x64; Mosaic has no i64
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (zero,) * len(shape))
    out = pl.pallas_call(
        kern,
        grid=(n, h // BH),
        in_specs=[
            pl.BlockSpec((1, BH, w), lambda i, j: (i, j, zero)),
            full(cw.shape), full(ch.shape), full(vw.shape),
            full(mw.shape), full(mh.shape),
            full((BH, w)), full((BH, w)),
        ],
        out_specs=pl.BlockSpec((1, BH, w), lambda i, j: (i, j, zero)),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xi, cw, ch, jnp.asarray(vw), jnp.asarray(mw), jnp.asarray(mh),
      qa_tile, qb_tile)
    return jnp.clip(out + level, 0, 255).astype(jnp.uint8)
