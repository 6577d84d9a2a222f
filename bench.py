#!/usr/bin/env python
"""Benchmark harness: the reference README's headline workload on one chip.

Reference baseline (reference README.md:41-44): BoxBlur hradius=13 vradius=13,
1 pass, 1920x1080 YUV420P16, 5000 frames -> 1046.11 fps on a desktop CPU.
Target (BASELINE.md): >= 10x on a single TPU v5e chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BASELINE_FPS = 1046.11  # reference README.md:43-44


def bench_boxblur(batch: int = 64, iters: int = 150, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp
    import vszip_tpu as vz
    from vszip_tpu.ops.boxblur import boxblur

    fmt = vz.get_format("YUV420P16")
    rng = np.random.default_rng(0)
    planes = tuple(
        rng.integers(0, 65536, (batch, 1080 >> (0 if p == 0 else 1),
                               1920 >> (0 if p == 0 else 1)), dtype=np.uint16)
        for p in range(3)
    )
    clip = vz.Clip.from_planes(planes, fmt).device()

    def step(clip):
        return boxblur(clip, hradius=13, vradius=13)

    jstep = jax.jit(step)

    # On the axon relay backend block_until_ready is a no-op (returns before
    # execution completes); the only reliable fence is a host transfer.  A
    # transfer that touches a full plane costs ~30 ms regardless of size, so
    # reduce to one element first and calibrate the constant away.
    @jax.jit
    def probe(c):
        return c.planes[0][0, 0, 0].astype(jnp.int32)

    def sync(c):
        return np.asarray(probe(c))

    for _ in range(warmup):
        sync(jstep(clip))

    # calibrated fence cost (no work queued)
    t0 = time.perf_counter()
    sync(clip)
    fence = time.perf_counter() - t0

    # chain on the output to serialize real work; single fence at the end
    t0 = time.perf_counter()
    out = clip
    for _ in range(iters):
        out = jstep(out)
    sync(out)
    dt = time.perf_counter() - t0 - fence
    return batch * iters / dt


def main():
    fps = bench_boxblur()
    print(json.dumps({
        "metric": "boxblur_r13_1080p_yuv420p16_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
