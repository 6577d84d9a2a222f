#!/usr/bin/env python
"""Round-5 roofline: decompose the flagship BoxBlur r13's ratio to the
HBM-copy floor into per-stage costs (VERDICT r4 weak #4 / next #3).

Measures, chained+donated at the bench shape (batch 64 1080p YUV420P16):
  * the fused comptime kernel (the flagship path),
  * the runtime V-only kernel and H-only kernel separately,
  * the u8 variant of the fused kernel (hi/lo byte-split overhead probe),
  * the raw HBM copy floor.
Everything is a chained-dispatch loop ended by one readback fence
(bench.py discipline); run on an idle machine with the TPU attached.
"""

import sys
import time

import numpy as np

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import vszip_tpu as vz  # noqa: E402
from vszip_tpu.kernels.boxblur_pallas import (  # noqa: E402
    ct_blur_int_pallas, rt_blur_h_pallas, rt_blur_v_pallas)

BATCH, H, W = 64, 1080, 1920
R = 13


def bench_planes(name, step, planes, iters=100):
    """step: tuple-of-planes -> tuple-of-planes, jitted with donation."""
    jstep = jax.jit(step, donate_argnums=0)
    cur = tuple(jax.device_put(p) for p in planes)
    cur = jstep(cur)
    cur = jstep(cur)  # chained signature warm
    np.asarray(cur[0][0, 0, :1])
    # fence
    f = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(cur[0][0, 0, :1])
        f.append(time.perf_counter() - t0)
    fence = sorted(f)[1]
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = jstep(cur)
    np.asarray(cur[0][0, 0, :1])
    dt = (time.perf_counter() - t0 - fence) / iters
    mb = sum(p.nbytes for p in planes) / 1e6
    print(f"{name:34s} {dt*1e3:8.3f} ms  ({BATCH/dt:8.0f} fps, "
          f"{2*mb/dt/1e3:6.0f} GB/s rw)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 65536, (BATCH, H, W), np.uint16)
    u = rng.integers(0, 65536, (BATCH, H // 2, W // 2), np.uint16)
    v = rng.integers(0, 65536, (BATCH, H // 2, W // 2), np.uint16)
    planes = (y, u, v)
    y8 = (y >> 8).astype(np.uint8)

    print(f"shape: batch {BATCH} 1080p YUV420P16, radius {R}", flush=True)

    bench_planes("copy floor (xor, materialized)",
                 lambda ps: tuple(p ^ np.uint16(1) for p in ps), planes)
    t_fused = bench_planes(
        "fused ct V+H auto tile (flagship)",
        lambda ps: tuple(ct_blur_int_pallas(p, R) for p in ps), planes)
    bench_planes(
        "fused ct V+H tile 256 (old default)",
        lambda ps: tuple(ct_blur_int_pallas(p, R, 256) for p in ps), planes)
    t_v = bench_planes(
        "rt V-only",
        lambda ps: tuple(rt_blur_v_pallas(p, R) for p in ps), planes)
    t_h = bench_planes(
        "rt H-only",
        lambda ps: tuple(rt_blur_h_pallas(p, R) for p in ps), planes)
    print(f"{'V + H sum':34s} {(t_v + t_h)*1e3:8.3f} ms  "
          f"(fused saves {(t_v + t_h - t_fused)*1e3:.3f} ms = one HBM "
          f"round trip)", flush=True)
    bench_planes("fused ct, u8 luma only (split probe)",
                 lambda ps: (ct_blur_int_pallas(ps[0], R),), (y8,))
    bench_planes("fused ct, u16 luma only",
                 lambda ps: (ct_blur_int_pallas(ps[0], R),), (y,))


if __name__ == "__main__":
    main()
