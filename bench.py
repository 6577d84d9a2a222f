#!/usr/bin/env python
"""Benchmark harness: the reference README's headline workloads on one chip.

Reference baselines (reference README.md:31-50, the only published numbers,
desktop CPU): BoxBlur r13 1-pass 1046.11 fps, BoxBlur r13 5-pass 367.01 fps,
Bilateral s2/r2 141.36 fps — 1920x1080 YUV420P16.  Target (BASELINE.md):
>= 10x on a single TPU v5e chip.

Prints one JSON line per headline metric.  The FIRST line is the flagship
(same metric id as previous rounds); it also carries ``onchip_parity``,
the TPU-vs-CPU library-surface parity bit from benchmarks/tpu_parity.py
(17 ops: integer bit-exact, metrics at golden tolerance, EEDI3 bounded
tie-break flips).  ``*_streamed`` runs the same workload through the
chunked double-buffered streaming runtime (vszip_tpu/runtime/stream.py)
over the README's full 5000-frame clip, which never fits HBM at once.
"""

import json
import sys
import time

import numpy as np

ROOT = __file__.rsplit("/", 1)[0]
sys.path.insert(0, ROOT)
sys.path.insert(0, ROOT + "/benchmarks")

BASELINES = {  # reference README.md:31-50
    "boxblur_r13_1080p_yuv420p16_fps": 1046.11,
    "boxblur_r13_5pass_1080p_yuv420p16_fps": 367.01,
    "bilateral_s2r2_1080p_yuv420p16_fps": 141.36,
}


def _mk(vz, rng, fmtname, batch, h=1080, w=1920):
    fmt = vz.get_format(fmtname)
    bits = fmt.bits_per_sample
    planes = []
    for p in range(fmt.num_planes):
        ph = h >> (fmt.subsampling_h if p else 0)
        pw = w >> (fmt.subsampling_w if p else 0)
        if fmt.sample_type.name == "INTEGER":
            dt = np.uint8 if bits <= 8 else np.uint16
            planes.append(rng.integers(0, 1 << bits, (batch, ph, pw), dtype=dt))
        else:
            planes.append(rng.random((batch, ph, pw), dtype=np.float32))
    return vz.Clip.from_planes(tuple(planes), fmt).device()


def main():
    import jax
    import jax.numpy as jnp
    import vszip_tpu as vz

    rng = np.random.default_rng(0)
    batch = 64

    @jax.jit
    def probe(c):
        return c.planes[0][0, 0, 0].astype(jnp.float32)

    def sync(c):
        # On the axon relay backend block_until_ready returns before
        # execution completes; a 1-element host readback is the only fence.
        return np.asarray(probe(c))

    def fence_med(clip):
        f = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(clip)
            f.append(time.perf_counter() - t0)
        return sorted(f)[1]

    lines = []

    def bench(metric, step, clip, iters, b, chain=True):
        """fps via a chained-dispatch loop ended by one readback fence."""
        jstep = jax.jit(step)
        out = jstep(clip)
        sync(out)  # compile + warm (input signature)
        # warm the CHAINED signature too: ops whose output layout differs
        # from the input (CLAHE's pallas u8 output) otherwise recompile on
        # the first TIMED chained call — this is exactly what BENCH_r03
        # recorded as clahe 61.77 fps: 1600 frames / ~26 s of mid-timing
        # recompile, while the kernel's steady state is ~1050 fps
        sync(jstep(out if chain else clip))
        fence = fence_med(clip)
        t0 = time.perf_counter()
        out = clip
        for _ in range(iters):
            out = jstep(out if chain else clip)
        sync(out)
        dt = time.perf_counter() - t0 - fence
        fps = b * iters / dt
        base = BASELINES.get(metric)
        lines.append({
            "metric": metric, "value": round(fps, 2), "unit": "frames/sec",
            "vs_baseline": round(fps / base, 3) if base else None,
        })
        return fps

    y16 = _mk(vz, rng, "YUV420P16", batch)
    bench("boxblur_r13_1080p_yuv420p16_fps",
          lambda c: vz.boxblur(c, hradius=13, vradius=13), y16, 150, batch)
    bench("boxblur_r13_5pass_1080p_yuv420p16_fps",
          lambda c: vz.boxblur(c, hradius=13, hpasses=5, vradius=13,
                               vpasses=5), y16, 40, batch)
    bench("bilateral_s2r2_1080p_yuv420p16_fps",
          lambda c: vz.bilateral(c, sigmaS=2.0, sigmaR=2.0,
                                 planes=[0, 1, 2]), y16, 25, batch)
    # Deband output differs per grain stream; chain=False replays the input.
    bench("deband_m1_1080p_yuv420p16_fps",
          lambda c: vz.deband(c, sample_mode=1), y16, 15, batch, chain=False)
    bench("deband_m2_1080p_yuv420p16_fps",
          lambda c: vz.deband(c), y16, 8, batch, chain=False)

    g8 = _mk(vz, rng, "GRAY8", batch)
    bench("clahe_8bit_1080p_fps", lambda c: vz.clahe(c), g8, 25, batch)

    e_in = vz.Clip.from_planes(
        (rng.random((8, 540, 1920), dtype=np.float32),),
        vz.get_format("GRAYS")).device()
    bench("eedi3_dh_540to1080_w1920_fps",
          lambda c: vz.eedi3(c, field=1, dh=True), e_in, 8, 8, chain=False)

    # metrics: fence by reading the score back.  These scalar-prop loops
    # are short and fence-dominated on the relay (measured up to 3-4x
    # run-to-run spread from dispatch-queue state).  The HEADLINE value is
    # the MEDIAN of the repeated timed loops (the defensible estimator on a
    # noisy channel); best-of-N is kept as a secondary field, with the
    # observed spread, so the steady-state ceiling stays visible.
    def bench_metric(metric, fn, read, clip, iters, b, repeats=5):
        np.asarray(read(fn()))
        fence = fence_med(clip)
        dts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(read(out))
            dts.append((time.perf_counter() - t0 - fence) / iters)
        med = sorted(dts)[len(dts) // 2]
        lines.append({"metric": metric, "value": round(b / med, 2),
                      "unit": "frames/sec", "vs_baseline": None,
                      "best_fps": round(b / min(dts), 2),
                      "spread_fps": [round(b / max(dts), 2),
                                     round(b / min(dts), 2)],
                      "note": f"median of {repeats} loops of {iters}"})

    c1 = _mk(vz, rng, "YUV420P10", 32)
    c2 = vz.Clip.from_planes(
        tuple(np.clip(np.asarray(a).astype(np.int32)
                      + rng.integers(-8, 8, a.shape), 0, 1023).astype(np.uint16)
              for a in c1.planes), vz.get_format("YUV420P10")).device()
    bench_metric("xpsnr_1080p_yuv420p10_fps",
                 lambda: vz.xpsnr(c1, c2, fps=24),
                 lambda o: o.props["XPSNR_Y"], c1, 8, 32)

    r1 = vz.Clip.from_planes(
        tuple(rng.random((8, 1080, 1920), dtype=np.float32) for _ in range(3)),
        vz.get_format("RGBS")).device()
    r2 = vz.Clip.from_planes(
        tuple(np.clip(np.asarray(p) + 0.01, 0, 1) for p in r1.planes),
        vz.get_format("RGBS")).device()
    bench_metric("ssimulacra2_1080p_rgbs_fps",
                 lambda: vz.ssimulacra2(r1, r2),
                 lambda o: o.props["SSIMULACRA2"], r1, 4, 8)

    # streamed: the README's 5000-frame workload shape through the
    # double-buffered streaming runtime (vszip_tpu/runtime/stream.py).
    # Streamed == resident is verified bit-exactly on chip; throughput here
    # is bounded by this harness's host<->TPU relay tunnel (~30 MB/s
    # measured vs >=10 GB/s on a co-located v5e host), so the driver metric
    # uses a short run and records the tunnel bound explicitly.
    n_stream = 192
    template = tuple(np.asarray(p) for p in y16.planes)

    def make(start, stop):
        n = stop - start
        return tuple(p[:n] for p in template)

    source = vz.SyntheticSource(make, vz.get_format("YUV420P16"), n_stream)
    vz.process_stream(source, lambda c: vz.boxblur(c, hradius=13,
                                                   vradius=13), batch=batch)
    t0 = time.perf_counter()
    vz.process_stream(source,
                      lambda c: vz.boxblur(c, hradius=13, vradius=13),
                      batch=batch)
    dt = time.perf_counter() - t0
    fps = n_stream / dt
    frame_mb = sum(p[0].nbytes for p in template) / 1e6
    lines.append({"metric": "boxblur_r13_streamed_fps",
                  "value": round(fps, 2), "unit": "frames/sec",
                  "vs_baseline": round(fps / 1046.11, 3),
                  "note": (f"H2D-bound on the test harness relay tunnel "
                           f"(~{round(fps * frame_mb)} MB/s sustained; "
                           f"streamed==resident verified bit-exact)")})

    try:
        import tpu_parity

        results = tpu_parity.check()
        parity = "ok" if all(ok for _, ok, _ in results) else "fail:" + ",".join(
            name for name, ok, _ in results if not ok)
    except Exception as e:  # noqa: BLE001
        parity = f"error:{type(e).__name__}"
    lines[0]["onchip_parity"] = parity

    for line in lines:
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
