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


def bench_boxblur(batch: int = 64, iters: int = 100, depth: int = 50,
                  warmup: int = 2) -> float:
    import jax
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

    def sync(c):
        # On the axon relay backend block_until_ready can return before
        # execution completes; a 1-element readback is the reliable fence.
        return np.asarray(c.planes[0][0, 0, 0])

    # warmup / compile
    for _ in range(warmup):
        sync(jstep(clip))

    # chain on the output to serialize real work; fence every `depth`
    # dispatches — deep enough to amortize the readback RTT, shallow enough
    # that queued output buffers stay under HBM capacity
    t0 = time.perf_counter()
    out = clip
    n = 0
    while n < iters:
        for _ in range(depth):
            out = jstep(out)
            n += 1
        sync(out)
    dt = time.perf_counter() - t0
    return batch * n / dt


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
