#!/usr/bin/env python
"""Single-chip throughput sweep over every filter at 1080p.

Prints one line per op: name, ms/step, frames/sec.  Uses the calibrated
transfer fence from bench.py (block_until_ready is a no-op on the relay
backend; a host transfer is the only real fence, and costs a ~30 ms
constant that is measured and subtracted).

Run on an idle machine: python benchmarks/sweep.py [batch]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(batch: int = 32) -> None:
    import jax
    import jax.numpy as jnp
    import vszip_tpu as vz

    rng = np.random.default_rng(0)

    def mk(fmtname, b=batch):
        fmt = vz.get_format(fmtname)
        bits = fmt.bits_per_sample
        hi = 2 ** bits if fmt.sample_type.name == "INTEGER" else None
        planes = []
        for p in range(fmt.num_planes):
            h = 1080 >> (fmt.subsampling_h if p else 0)
            w = 1920 >> (fmt.subsampling_w if p else 0)
            if hi:
                dt = np.uint8 if bits <= 8 else np.uint16
                planes.append(rng.integers(0, hi, (b, h, w), dtype=dt))
            else:
                planes.append(rng.random((b, h, w), dtype=np.float32))
        return vz.Clip.from_planes(tuple(planes), fmt).device()

    @jax.jit
    def probe(c):
        return c.planes[0][0, 0, 0].astype(jnp.float32)

    def sync(c):
        return np.asarray(probe(c))

    def fence_med(clip):
        f = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(clip)
            f.append(time.perf_counter() - t0)
        return sorted(f)[1]

    def bench(name, step, clip, n=15, b=batch):
        try:
            jstep = jax.jit(step)
            out = jstep(clip)
            sync(out)
            fence = fence_med(clip)
            t0 = time.perf_counter()
            for _ in range(n):
                out = jstep(clip)
            sync(out)
            dt = (time.perf_counter() - t0 - fence) / n
            print(f"{name:24s} {dt * 1e3:9.2f} ms/step {b / dt:9.0f} fps",
                  flush=True)
        except Exception as e:  # pragma: no cover - reporting only
            print(f"{name:24s} FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    y8, y16 = mk("YUV420P8"), mk("YUV420P16")
    g8, g16, gs = mk("GRAY8"), mk("GRAY16"), mk("GRAYS")

    bench("boxblur r13", lambda c: vz.boxblur(c, hradius=13, vradius=13), y16)
    bench("boxblur r13 x5",
          lambda c: vz.boxblur(c, hradius=13, hpasses=5, vradius=13,
                               vpasses=5), y16, n=8)
    bench("bilateral s2 r2",
          lambda c: vz.bilateral(c, sigmaS=2.0, sigmaR=2.0, planes=[0, 1, 2]),
          y16, n=8)
    bench("limiter", lambda c: vz.limiter(c, tv_range=True), y16)
    bench("limit_filter", lambda c: vz.limit_filter(c, c, dark_thr=2.0), y16)
    bench("adaptive_binarize", lambda c: vz.adaptive_binarize(c, c, c=4), y8)
    bench("comb_mask_mt", lambda c: vz.comb_mask_mt(c), y8)
    bench("comb_mask", lambda c: vz.comb_mask(c), y8)
    bench("checkmate", lambda c: vz.checkmate(c), y8)
    bench("mosquito_nr", lambda c: vz.mosquito_nr(c), g16)
    bench("compress", lambda c: vz.compress(c), y8, n=8)
    bench("clahe 8bit", lambda c: vz.clahe(c), g8, n=8)
    bench("colormap", lambda c: vz.colormap(c), g8)
    bench("deband m2(default)", lambda c: vz.deband(c), y16, n=5)
    bench("deband m1", lambda c: vz.deband(c, sample_mode=1), y16, n=5)
    bench("deband m4", lambda c: vz.deband(c, sample_mode=4), y16, n=5)
    bench("deband m6", lambda c: vz.deband(c, sample_mode=6), y16, n=5)
    bench("deband m7", lambda c: vz.deband(c, sample_mode=7), y16, n=5)
    bench("bdither default r16", lambda c: vz.bilateral_dither(c), g16, n=5)
    bench("bdither dense r16", lambda c: vz.bilateral_dither(c, subspl=2.0),
          g16, n=3)
    bench("rfs", lambda c: vz.rfs(c, c, frames=[0, 2]), y8)
    bench("packrgb", lambda c: vz.packrgb(c), mk("RGB24"))
    bench("mosquito f32", lambda c: vz.mosquito_nr(c), gs)

    # eedi3: f32 interpolation 540 -> 1080
    e_in = vz.Clip.from_planes(
        (rng.random((8, 540, 1920), dtype=np.float32),),
        vz.get_format("GRAYS")).device()
    bench("eedi3 dh 540->1080", lambda c: vz.eedi3(c, field=1, dh=True),
          e_in, n=5, b=8)
    bench("eedi3 hp dh 540->1080",
          lambda c: vz.eedi3(c, field=1, dh=True, hp=True), e_in, n=5, b=8)
    bench("eedi3 vcheck dh", lambda c: vz.eedi3(c, field=1, dh=True, vcheck=2),
          e_in, n=5, b=8)
    eh_in = vz.Clip.from_planes(
        (rng.random((8, 1080, 960), dtype=np.float32),),
        vz.get_format("GRAYS")).device()
    bench("eedi3h dh 960->1920", lambda c: vz.eedi3h(c, field=1, dh=True),
          eh_in, n=5, b=8)

    # metrics (sync internally)
    p2 = tuple(
        np.clip(np.asarray(a).astype(np.int32)
                + rng.integers(-8, 8, a.shape), 0, 1023).astype(np.uint16)
        for a in mk("YUV420P10").planes
    )
    c1 = mk("YUV420P10")
    c2 = vz.Clip.from_planes(p2, vz.get_format("YUV420P10")).device()
    # props are device arrays now: fence by reading one back
    np.asarray(vz.xpsnr(c1, c2, fps=24).props["XPSNR_Y"])
    fence = fence_med(c1)
    t0 = time.perf_counter()
    for _ in range(5):
        out = vz.xpsnr(c1, c2, fps=24)
    np.asarray(out.props["XPSNR_Y"])
    dt = (time.perf_counter() - t0 - fence) / 5
    print(f"{'xpsnr':24s} {dt * 1e3:9.2f} ms/call {batch / dt:9.0f} fps")

    r1 = vz.Clip.from_planes(
        tuple(rng.random((8, 1080, 1920), dtype=np.float32) for _ in range(3)),
        vz.get_format("RGBS")).device()
    r2 = vz.Clip.from_planes(
        tuple(np.clip(np.asarray(p) + 0.01, 0, 1) for p in r1.planes),
        vz.get_format("RGBS")).device()
    np.asarray(vz.ssimulacra2(r1, r2).props["SSIMULACRA2"])
    fence = fence_med(r1)
    t0 = time.perf_counter()
    for _ in range(3):
        out = vz.ssimulacra2(r1, r2)
    np.asarray(out.props["SSIMULACRA2"])
    dt = (time.perf_counter() - t0 - fence) / 3
    print(f"{'ssimulacra2':24s} {dt * 1e3:9.2f} ms/call {8 / dt:9.0f} fps")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
