#!/usr/bin/env python
"""Deband m2 round-5 experiment: does gather-index LOCALITY matter on the
chip?  (VERDICT r4 next #4.)

The m2 ref offsets are create-time constants, so host-side reordering is
free: if sorting the gather indices (bucketing pixels into
gather-coherent segments) made the device gather faster, the op could
run sorted slices + one inverse permutation.  This measures, at the
bench shape (batch 64, 1080p luma):

  1. the raw random gather (the m2 tap pattern, u32 frame-pair packed),
  2. the same gather with HOST-SORTED indices + the inverse permutation
     gather needed to restore order (what bucketing would actually cost),
  3. the sorted gather alone (the locality upper bound, unusable without
     the un-permute),
  4. a contiguous roll (pure-shift lower bound: what a single-offset
     alphabet bucket costs).

If (3) is not materially faster than (1), TPU gather throughput is
index-oblivious and bucketing cannot beat the existing joint-alphabet
select-chain kernel (kernels/deband_m2_pallas.py); the m2 tail is then
settled by the VPU/gather floor analysis
(benchmarks/deband_m2_mxu_experiment.py + roofline notes).
"""

import sys
import time

import numpy as np

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, H, W = 64, 1080, 1920
RANGE = 15


def bench(name, step, arrs, iters=8):
    jstep = jax.jit(step)
    out = jstep(*arrs)
    out = jstep(*arrs)
    np.asarray(out.ravel()[:1])
    f = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(out.ravel()[:1])
        f.append(time.perf_counter() - t0)
    fence = sorted(f)[1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jstep(*arrs)
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0 - fence) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 65536, (N, H, W), np.uint16)
    # frame-pair packed u32 (the op's own trick): 32 half-planes
    xp = (x[0::2].astype(np.uint32) | (x[1::2].astype(np.uint32) << 16))
    flat = xp.reshape(N // 2, H * W)

    # m2-style per-pixel 2-D offsets, clamped in-plane (one tap shown; the
    # op needs 4, but per-tap cost is what matters)
    dy = rng.integers(-RANGE, RANGE + 1, (H, W))
    dx = rng.integers(-RANGE, RANGE + 1, (H, W))
    yy = np.clip(np.arange(H)[:, None] + dy, 0, H - 1)
    xx = np.clip(np.arange(W)[None, :] + dx, 0, W - 1)
    idx = (yy * W + xx).astype(np.int32).ravel()

    order = np.argsort(idx, kind="stable").astype(np.int32)
    idx_sorted = idx[order]
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=np.int32)

    j_idx = jnp.asarray(idx)
    j_sorted = jnp.asarray(idx_sorted)
    j_inv = jnp.asarray(inv)
    j_flat = jnp.asarray(flat)

    bench("random gather (1 tap, packed u32)",
          lambda a: jnp.take(a, j_idx, axis=1), (j_flat,))
    bench("sorted gather + inverse-permute (bucketed)",
          lambda a: jnp.take(jnp.take(a, j_sorted, axis=1), j_inv, axis=1),
          (j_flat,))
    bench("sorted gather alone (locality bound)",
          lambda a: jnp.take(a, j_sorted, axis=1), (j_flat,))
    bench("contiguous roll (pure-shift bound)",
          lambda a: jnp.roll(a, 7, axis=1), (j_flat,))
    bench("4-tap random gather (the full m2 pattern)",
          lambda a: (jnp.take(a, j_idx, axis=1)
                     + jnp.take(a, j_inv, axis=1)
                     + jnp.take(a, j_sorted, axis=1)
                     + jnp.take(a, jnp.flip(j_idx), axis=1)), (j_flat,))


if __name__ == "__main__":
    main()


# Measured r5 (v5e, batch 64 1080p luma, RANGE 15; 8-iter chained means):
#   random gather (1 tap, packed u32)              78.6 ms
#   sorted gather + inverse-permute (bucketed)    191.0 ms
#   sorted gather alone (locality bound)          114.1 ms
#   contiguous roll (pure-shift bound)              0.77 ms
#   4-tap random gather (the full m2 pattern)     351.5 ms
# Conclusions: TPU gather throughput is index-OBLIVIOUS (sorting the
# indices is 1.45x SLOWER, bucketing+unpermute 2.4x slower), so host-side
# reordering of the create-time-constant offsets cannot help; and the
# shipped joint-alphabet select-chain kernel (deband_m2_pallas.py) already
# runs the COMPLETE op — 4 taps + mode arithmetic + grain — in ~331 ms per
# 64-frame call (193 fps), i.e. cheaper than the 4 raw gathers it
# replaces.  The m2 tail is the hardware floor for this access pattern.
