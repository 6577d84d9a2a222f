#!/usr/bin/env python
"""VERDICT r2 #8 experiment: can an MXU one-hot formulation beat the
select-chain floor of Deband m2's joint 2-D gather?

Mode 2's four taps are a JOINT 2-D gather: r1 = src[y+val2][x+val1] etc.
(reference src/filters/deband_int.zig avg_4 pairing).  The shipped kernel
(kernels/deband_m2_pallas.py) resolves it as a select chain over the joint
(val1, val2) alphabet: (2r+1)^2 = 961 combos x (2 cmp + 4 load + 4 select)
on a VMEM band — its documented VPU floor.

The proposed alternative (VERDICT r2 #8): row offset via 2r+1 shifted
sublane slices, column offset as a "banded one-hot MXU gather".  This file
implements that formulation and measures it.  The decomposition constraint
it runs into:

    r1[x] = src[y + val2[x]][x + val1[x]]

BOTH offsets are indexed by the OUTPUT x, so the two axes cannot be
resolved sequentially (a row-select after a column shift needs val2 at x,
not at x+dx) — any factored form still touches all (2r+1)^2 (dy, dx)
terms.  The only way to put the contraction on the MXU is a BATCHED
MATVEC: per output pixel a (1 x K) one-hot row against a (K x 1) gathered
column, batch = every pixel.  That shape has two structural costs no
tiling removes:

  1. Operand formation: the one-hot operand is K bf16 values PER PIXEL
     (K = 2r+1 = 31 for the column stage): 31 compares + 31 stores/pixel
     to HBM/VMEM — already the same order as the select chain's work,
     paid before the MXU does anything.
  2. Utilization: batched 31-long matvecs tile the 128x128 systolic array
     at (31/128) ~ 24% in one dimension and 1/128 in the other unless
     XLA batches 128 pixels per pass — and each pixel's matrix is
     different, so the batch dim maps to MXU *rows* only via
     block-diagonal embedding, which multiplies operand bytes by 128.

Measured result (one v5e chip, 8 x 1080p GRAY16, range 15, 2026-08-20):

    mxu one-hot joint gather (1 tap)       302.8 ms
    select-chain joint gather (1 tap, XLA) 371.1 ms
    shipped fused m2 kernel (ALL 4 taps
      + thresholds + grain + round)         25.5 ms

Both experimental formulations agree bit-exactly with each other and are
~12x slower than the shipped Pallas kernel at a QUARTER of its tap work —
the MXU contraction edges out the unfused XLA chain but is dominated by
one-hot operand materialization (the (b,h,w,K) bf16 one-hots plus K
dy-shifted limb planes are ~33x the plane's bytes in HBM traffic, vs the
shipped kernel's one read + one write per band).  The select-chain floor
documented in kernels/deband_m2_pallas.py stands; this file is the
auditable record.

Run: python benchmarks/deband_m2_mxu_experiment.py
"""

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

R = 15  # deband default range
K = 2 * R + 1


def mxu_joint_gather(src, val1, val2):
    """The batched one-hot formulation of the m2 quadruple's first tap
    r1[b,y,x] = src[b, y+val2, x+val1] (offsets pre-clamped so all reads
    are in-bounds, as the shipped kernel guarantees).

    Stage 1 (row): stack 2r+1 sublane-shifted copies, contract against the
    val2 one-hot — this is the '31 shifted slices' half of the proposal.
    Stage 2 (col): contract 2r+1 lane-shifted copies of the row-STACKED
    tensor against the val1 one-hot, keeping the dy axis free so stage 1's
    select can still use val2 at the output x (the joint-index constraint);
    i.e. the full (dy, dx) product is materialized for the MXU.
    """
    b, h, w = src.shape
    # u16 values are NOT bf16-exact: split into hi/lo byte limbs (each
    # <= 255, exact in bf16) and contract each — the same limb cost every
    # shipped MXU kernel pays, so it belongs in the measurement.
    f = jnp.stack([(src >> 8).astype(jnp.bfloat16),
                   (src & 255).astype(jnp.bfloat16)])  # (2, b, h, w)
    # (K, 2, b, h, w): dy-shifted rows (edges never selected: |val2| <= dist)
    pad_y = jnp.pad(f, ((0, 0), (0, 0), (R, R), (0, 0)))
    rows = jnp.stack([pad_y[:, :, k : k + h, :] for k in range(K)])
    # (K, K, b, h, w) is 961 plane copies — the operand-formation cost the
    # docstring calls out.  Materialize lazily per-dx inside a scan so the
    # experiment runs at 1080p without OOM; the MXU contraction is over dy.
    oh2 = jax.nn.one_hot(val2 + R, K, dtype=jnp.bfloat16)  # (b,h,w,K)
    oh1 = jax.nn.one_hot(val1 + R, K, dtype=jnp.bfloat16)

    pad_x = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, 0), (R, R)))

    def body(acc, k):
        shifted = jax.lax.dynamic_slice_in_dim(pad_x, k, w, axis=4)
        # contract dy on the MXU per limb: (b,h,w,K) x (K,2,b,h,w) -> (2,b,h,w)
        sel = jnp.einsum("bhwk,klbhw->lbhw", oh2, shifted,
                         preferred_element_type=jnp.float32)
        val = sel[0] * 256.0 + sel[1]
        return acc + val * oh1[..., k].astype(jnp.float32), None

    acc0 = jnp.zeros(src.shape, jnp.float32)
    out, _ = jax.lax.scan(body, acc0, jnp.arange(K))
    return out


def chain_joint_gather(src, val1, val2):
    """The shipped formulation's XLA-level equivalent (select chain over the
    joint alphabet) for a like-for-like single-tap comparison."""
    b, h, w = src.shape
    pad = jnp.pad(src, ((0, 0), (R, R), (R, R)))

    def body(acc, k):
        dy, dx = k // K, k % K
        win = jax.lax.dynamic_slice(pad, (0, dy, dx), (b, h, w))
        hit = (val2 + R == dy) & (val1 + R == dx)
        return jnp.where(hit, win, acc), None

    out, _ = jax.lax.scan(body, jnp.zeros_like(src), jnp.arange(K * K))
    return out


def bench(name, fn, *args, n=5):
    j = jax.jit(fn)
    out = j(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = j(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(3)
    b, h, w = 8, 1080, 1920
    src = jnp.asarray(rng.integers(0, 65536, (b, h, w), dtype=np.uint16)
                      .astype(np.int32))
    yy = np.arange(h)[None, :, None]
    xx = np.arange(w)[None, None, :]
    lim_y = np.minimum(yy, h - 1 - yy)
    lim_x = np.minimum(xx, w - 1 - xx)
    lim = np.minimum(R, np.minimum(lim_y, lim_x))
    v1 = rng.integers(-R, R + 1, (b, h, w)).astype(np.int32)
    v2 = rng.integers(-R, R + 1, (b, h, w)).astype(np.int32)
    val1 = jnp.asarray(np.clip(v1, -lim, lim))
    val2 = jnp.asarray(np.clip(v2, -lim, lim))

    a = np.asarray(jax.jit(mxu_joint_gather)(src, val1, val2))
    c = np.asarray(jax.jit(chain_joint_gather)(src, val1, val2))
    assert np.array_equal(a.astype(np.int64), c.astype(np.int64)), \
        "formulations disagree — measurement would be meaningless"
    print("formulations agree bit-exactly at 8x1080p", flush=True)

    t_mxu = bench("mxu one-hot joint gather (1 tap)", mxu_joint_gather,
                  src, val1, val2)
    t_chain = bench("select-chain joint gather (1 tap)", chain_joint_gather,
                    src, val1, val2)

    import vszip_tpu as vz
    fmt = vz.get_format("GRAY16")
    clip = vz.Clip.from_planes(
        (np.asarray(src, dtype=np.uint16).astype(np.uint16),), fmt).device()
    jd = jax.jit(lambda c: vz.deband(c))
    o = jd(clip); np.asarray(o.planes[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        o = jd(clip)
    np.asarray(o.planes[0][0, 0, 0])
    t_ship = (time.perf_counter() - t0) / 5
    print(f"{'shipped fused m2 kernel (ALL 4 taps)':38s} {t_ship * 1e3:9.2f} ms",
          flush=True)

    verdict = "LOSES" if t_mxu > t_ship else "WINS"
    print(f"\nMXU formulation {verdict} vs the shipped kernel: "
          f"{t_mxu * 1e3:.1f} ms for ONE tap vs {t_ship * 1e3:.1f} ms for "
          f"all four taps + the full filter "
          f"({t_chain * 1e3:.1f} ms for the unfused XLA select chain).")


if __name__ == "__main__":
    main()
