"""Fused Pallas TPU kernel for SSIMULACRA2's per-scale plane statistics.

Reference: src/filters/ssimulacra2.zig:247-628 (blur + ssimMap + edgeMap).
The XLA formulation runs up to four 9-tap separable Gaussian blurs per
(scale, plane) pair (mu1, mu2, im1*im2, (im1+im2)^2) and then three
full-plane map/reduce passes — each blur pass and each map is its own
HBM round trip, ~20 plane traversals per pair.  Here ONE grid step loads
a 64-row band of im1/im2 (plus a 4-row halo), forms all four blur
sources in VMEM, runs both separable passes and the SSIM / artifact /
detail-loss maps in registers, and emits six row-reduced partial sums.
im1/im2 are read exactly once from HBM; nothing else is written but the
(8, W) partials per band.

Edge handling is the reference blur's hybrid rule, exact:

* leading taps (off < 0) are reflect-101 — the value at virtual index
  -k is x[k], independent of the output position, so the top halo is a
  4-row reflected slice (block 0) or the neighbor block's last rows;
* trailing taps (off > 0) past the end read the FIXED index n-1-off
  (dependent on the tap, not the output position), which cannot be
  expressed as padding — instead the caller passes the 4 candidate
  replacement rows/cols ``x[n-1-off]`` and the kernel selects them with
  an iota mask per tap.

The sums match the jnp path's f32 ladder order per band; cross-band
accumulation happens in f64 in the caller (the jnp path reduces the
whole plane in f32, a ~1e-7 relative difference — the metric's score
contract is 1e-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8        # sublane-aligned head/tail block height (>= 4 used)

_K = np.array([
    0.0076144188642501831054687500, 0.0360749699175357818603515625,
    0.1095860823988914489746093750, 0.2134445458650588989257812500,
    0.2665599882602691650390625000, 0.2134445458650588989257812500,
    0.1095860823988914489746093750, 0.0360749699175357818603515625,
    0.0076144188642501831054687500,
], np.float32)
_RADIUS = 4


def _reflect4(a):
    """Rows 4,3,2,1 of a -- the reflect-101 top halo (virtual rows -4..-1)."""
    return jnp.concatenate(
        [a[4:5], a[3:4], a[2:3], a[1:2]], axis=0)


def _vblur(band, tr, rowg, h: int, b: int):
    """9-tap vertical pass. band: (b+8, W) rows [r0-4, r0+b+4); tr: (4, W)
    with tr[o-1] = x[h-1-o] (the trailing-rule replacement rows); rowg:
    (b, W) global output row indices."""
    acc = None
    for k in range(9):
        off = k - _RADIUS
        tap = band[k : k + b]
        if off > 0:
            tap = jnp.where(rowg + jnp.int32(off) > jnp.int32(h - 1),
                            tr[off - 1 : off], tap)
        t = _K[k] * tap
        acc = t if acc is None else acc + t
    return acc


def _hblur(v, w: int):
    """9-tap horizontal pass on (B, W) with the same hybrid edge rule.
    All indices are static in W."""
    left = jnp.concatenate([v[:, 4:5], v[:, 3:4], v[:, 2:3], v[:, 1:2]],
                           axis=1)
    right = jnp.concatenate([v[:, w - 1 : w]] * _RADIUS, axis=1)
    pad = jnp.concatenate([left, v, right], axis=1)  # cols -4 .. w+3
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    acc = None
    for k in range(9):
        off = k - _RADIUS
        tap = pad[:, k : k + w]
        if off > 0:
            tap = jnp.where(cols > jnp.int32(w - 1 - off),
                            v[:, w - 1 - off : w - off], tap)
        t = _K[k] * tap
        acc = t if acc is None else acc + t
    return acc


def _ssim_kernel(m1_ref, m2_ref, h1_ref, h2_ref, t1_ref, t2_ref,
                 tr1_ref, tr2_ref, o_ref, *, h: int, w: int, b: int,
                 need_ssim: bool, need_err: bool):
    j = pl.program_id(1)
    r0 = j * jnp.int32(b)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (b, w), 0) + r0
    valid = rowg < jnp.int32(h)

    a1 = m1_ref[0]
    a2 = m2_ref[0]
    tr1 = tr1_ref[0]
    tr2 = tr2_ref[0]
    top1 = jnp.where(j == 0, _reflect4(a1), h1_ref[0, HALO - 4 :])
    top2 = jnp.where(j == 0, _reflect4(a2), h2_ref[0, HALO - 4 :])
    band1 = jnp.concatenate([top1, a1, t1_ref[0, :4]], axis=0)
    band2 = jnp.concatenate([top2, a2, t2_ref[0, :4]], axis=0)

    mu1 = _hblur(_vblur(band1, tr1, rowg, h, b), w)
    mu2 = _hblur(_vblur(band2, tr2, rowg, h, b), w)

    zrow = jnp.zeros((1, w), jnp.float32)

    def emit(k, m):
        o_ref[0, 0, k, :] = jnp.sum(jnp.where(valid, m, 0.0), axis=0)
        m4 = (m * m) * (m * m)
        o_ref[0, 0, k + 1, :] = jnp.sum(jnp.where(valid, m4, 0.0), axis=0)

    if need_ssim:
        s12 = _hblur(_vblur(band1 * band2, tr1 * tr2, rowg, h, b), w)
        # den = num_core + [blur((im1-im2)^2) - (mu1-mu2)^2]: the bracketed
        # correction is exactly zero for identical inputs, so den_s ==
        # num_s bit-for-bit and identical inputs score exactly 100 under
        # any compiler FMA contraction (see ops/ssimulacra2.py
        # _plane_sums_xla; the reference's (im1+im2)^2 - 2*s12 form only
        # cancels when the mu products happen to round identically).
        bd = band1 - band2
        td = tr1 - tr2
        sd = _hblur(_vblur(bd * bd, td * td, rowg, h, b), w)
        md = mu1 - mu2
        num_m = 1.0 - md * md
        s12c = s12 - mu1 * mu2
        core = s12c + s12c
        num_s = core + jnp.float32(0.0009)
        den_s = (core + (sd - md * md)) + jnp.float32(0.0009)
        d1 = jnp.maximum(1.0 - (num_m * num_s) / den_s, jnp.float32(0.0))
        emit(0, d1)
    else:
        o_ref[0, 0, 0, :] = zrow[0]
        o_ref[0, 0, 1, :] = zrow[0]
    if need_err:
        n1 = jnp.abs(a1 - mu1)
        n2 = jnp.abs(a2 - mu2)
        d1e = (1.0 + n2) / (1.0 + n1) - 1.0
        emit(2, jnp.maximum(d1e, jnp.float32(0.0)))
        emit(4, jnp.maximum(-d1e, jnp.float32(0.0)))
    else:
        for k in range(2, 6):
            o_ref[0, 0, k, :] = zrow[0]
    o_ref[0, 0, 6, :] = zrow[0]
    o_ref[0, 0, 7, :] = zrow[0]


@functools.partial(jax.jit, static_argnums=(2, 3),
                   static_argnames=("interpret",))
def ssim_sums_pallas(im1, im2, need_ssim: bool, need_err: bool,
                     interpret: bool = False):
    """im1, im2: (N, H, W) f32.  Returns (N, 6) f64 raw map sums in the
    order [ssim_1, ssim_4, artifact_1, artifact_4, detailloss_1,
    detailloss_4] (the 4-norm entries are sums of m^4, pre root)."""
    n, h, w = im1.shape
    b = 64 if w <= 2560 else 32
    nbh = -(h // -b)
    qmax = np.int32((h - 1) // HALO)
    zero = np.int32(0)
    q = np.int32(b // HALO)

    # trailing-rule replacement rows: tr[o-1] = x[h-1-o]
    tr1 = im1[:, h - 5 : h - 1][:, ::-1]
    tr2 = im2[:, h - 5 : h - 1][:, ::-1]

    pspec = lambda: pl.BlockSpec((1, b, w), lambda i, j: (i, j, zero),
                                 memory_space=pltpu.VMEM)
    hspec = lambda: pl.BlockSpec(
        (1, HALO, w),
        lambda i, j: (i, jnp.maximum(j * q - np.int32(1), zero), zero),
        memory_space=pltpu.VMEM)
    tspec = lambda: pl.BlockSpec(
        (1, HALO, w),
        lambda i, j: (i, jnp.minimum((j + np.int32(1)) * q, qmax), zero),
        memory_space=pltpu.VMEM)
    rspec = lambda: pl.BlockSpec((1, 4, w), lambda i, j: (i, zero, zero),
                                 memory_space=pltpu.VMEM)

    kern = functools.partial(_ssim_kernel, h=h, w=w, b=b,
                             need_ssim=need_ssim, need_err=need_err)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, nbh, 8, w), jnp.float32),
        grid=(n, nbh),
        in_specs=[pspec(), pspec(), hspec(), hspec(), tspec(), tspec(),
                  rspec(), rspec()],
        out_specs=pl.BlockSpec((1, 1, 8, w), lambda i, j: (i, j, zero, zero),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(im1, im2, im1, im2, im1, im2, tr1, tr2)
    return jnp.sum(out.astype(jnp.float64), axis=(1, 3))[:, :6]
