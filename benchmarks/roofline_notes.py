#!/usr/bin/env python
"""Measured floor analyses for the throughput tails (VERDICT r2 #7 / #4).

For each tail op this script measures the op AND its dominant cost
components in isolation on the chip, so the "this is the formulation's
floor" claims are auditable numbers, not assertions — the same discipline
kernels/deband_m2_pallas.py applies to mode 2.

Components measured:

* Deband m7 vs m6: m7 = m6 + the angle machinery (Sobel + arctan over the
  (h+256, w+256) padded plane + four 2*range-step masked select chains,
  reference src/filters/deband_int.zig:351-414).  The arctan floor and the
  select-chain floor are measured standalone; m7's overhead over m6 should
  land near their sum.
* BilateralDither subspl: the point-list tap loop is the whole op; its
  floor is taps x (2 pltpu.roll slab copies + |d|/clamp/fma) on the VMEM
  band.  Measured standalone as a roll+fma loop at the same tap count.
* EEDI3 hp vs non-hp: hp doubles the direction alphabet (4*mdis+1 = 81 vs
  2*mdis+1 = 41 taps) and adds the half-pel row build; equal per-direction
  efficiency predicts hp_time ~ nonhp_time * 81/41 = 1.98x.  The measured
  ratio says whether hp has formulation slack beyond the alphabet size.

Run: python benchmarks/roofline_notes.py
"""

import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=5):
    j = jax.jit(fn)
    out = j(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[0]) if hasattr(a, "ravel") else a, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = j(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[0]) if hasattr(a, "ravel") else a, out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import vszip_tpu as vz

    rng = np.random.default_rng(11)
    b, h, w = 32, 1080, 1920

    # ---------------- Deband m7 ----------------
    y = rng.integers(0, 65536, (b, h, w), dtype=np.uint16)
    u = rng.integers(0, 65536, (b, h // 2, w // 2), dtype=np.uint16)
    v = rng.integers(0, 65536, (b, h // 2, w // 2), dtype=np.uint16)
    clip = vz.Clip.from_planes((y, u, v), vz.get_format("YUV420P16")).device()

    t_m6 = bench("deband m6 (m7 minus angle machinery)",
                 lambda c: vz.deband(c, sample_mode=6), clip)
    t_m7 = bench("deband m7", lambda c: vz.deband(c, sample_mode=7), clip)

    # the angle plane alone: Sobel + arctan at every padded coordinate
    # (ops/deband.py _angle_plane), luma-sized
    from vszip_tpu.ops.deband import _angle_plane
    yf = jnp.asarray(y.astype(np.float32))
    t_ang = bench("  angle plane (Sobel + arctan, padded)",
                  lambda a: _angle_plane(a), yf)

    # the four select chains alone (rmax=15 -> 60 masked selects of
    # shifted views of a materialized (h+256, w+256) plane)
    ang = jnp.pad(yf, ((0, 0), (128, 128), (128, 128)))
    vmap = jnp.asarray(rng.integers(0, 16, (b, h, w), dtype=np.int32))

    def chains(ang, vmap):
        outs = []
        for sgn_axis in range(4):
            a1 = ang[:, 128:-128, 128:-128]
            for a in range(1, 16):
                m = vmap == a
                if sgn_axis == 0:
                    view = ang[:, 128 + a : 128 + a + h, 128 : 128 + w]
                elif sgn_axis == 1:
                    view = ang[:, 128 - a : 128 - a + h, 128 : 128 + w]
                elif sgn_axis == 2:
                    view = ang[:, 128 : 128 + h, 128 + a : 128 + a + w]
                else:
                    view = ang[:, 128 : 128 + h, 128 - a : 128 - a + w]
                a1 = jnp.where(m, view, a1)
            outs.append(a1)
        return sum(outs)

    t_chain = bench("  4x15 angle select chains (luma)", chains, ang, vmap)
    print(f"  -> m7 - m6 = {1e3 * (t_m7 - t_m6):.2f} ms; measured components "
          f"(arctan {1e3 * t_ang:.2f} + chains {1e3 * t_chain:.2f}) = "
          f"{1e3 * (t_ang + t_chain):.2f} ms", flush=True)

    # ---------------- BilateralDither subspl ----------------
    g16 = vz.Clip.from_planes(
        (rng.integers(0, 65536, (b, h, w), dtype=np.uint16),),
        vz.get_format("GRAY16")).device()
    t_sub = bench("bilateral_dither subspl (default r16)",
                  lambda c: vz.bilateral_dither(c), g16, n=3)

    from vszip_tpu.ops.bilateral_dither_points import generate
    all_pts, k = generate(16, 16, 0.0)  # the default: k taps, 23 row lists
    pts = [(int(p[0]), int(p[1])) for p in all_pts[0]]
    npts = len(pts)
    print(f"  subspl point list: {npts} taps x 23 per-row lists", flush=True)

    # the tap loop's floor shape: per tap one shifted read + |d| + clamp +
    # fma on the full plane (XLA-level stand-in for the in-kernel
    # roll+select chain; same arithmetic intensity)
    pad = jnp.pad(jnp.asarray(
        rng.integers(0, 65536, (b, h, w)).astype(np.float32)),
        ((0, 0), (16, 16), (16, 16)))

    def taploop(pad):
        c = pad[:, 16 : 16 + h, 16 : 16 + w]
        acc = jnp.zeros_like(c)
        wsum = jnp.zeros_like(c)
        for dy, dx in pts:
            t = pad[:, 16 + dy : 16 + dy + h, 16 + dx : 16 + dx + w]
            wgt = jnp.clip(jnp.float32(16384.0) - jnp.abs(t - c), 0.0,
                           jnp.float32(8192.0))
            acc = acc + wgt * t
            wsum = wsum + wgt
        return acc / wsum

    t_tap = bench(f"  {npts}-tap shifted-read weight loop (XLA)", taploop,
                  pad, n=3)
    print(f"  -> op/floor ratio {t_sub / t_tap:.2f}x (the kernel pays two "
          f"dynamic pltpu.rolls per tap — the offsets differ per ROW via "
          f"the 23 LCG-chosen lists, so static slices can't replace them)",
          flush=True)

    # ---------------- flagship headroom: HBM-copy bound ----------------
    # VERDICT r3 weak #7: BoxBlur r13 at ~14.5k fps moves ~180 GB/s
    # effective — is the rest of the v5e HBM roofline (819 GB/s) left on
    # the table by the KERNEL, or by relay/dispatch overhead?  Measure, at
    # the exact benchmark shape and dtype, (a) a pure HBM round trip
    # (x + 1: one plane read + one write, the same traffic the fused
    # blur's ideal schedule needs) and (b) an empty dispatch (readback
    # fence only), then print the decomposition.
    y16_b = vz.Clip.from_planes(
        tuple(rng.integers(0, 65536,
                           (64, 1080 >> (p > 0), 1920 >> (p > 0)),
                           dtype=np.uint16) for p in range(3)),
        vz.get_format("YUV420P16")).device()
    nbytes = sum(int(np.prod(pl.shape)) * 2 for pl in y16_b.planes)

    # CHAINED measurement (out = j(out)), like bench.py's flagship loop:
    # independent same-input calls keep ~10 x 800 MB of outputs in flight
    # and measure allocator churn instead of bandwidth (10.9 ms vs 1.2 ms
    # chained+donated for the identical copy).  The clips must ride as
    # CALL ARGUMENTS: closing over them embeds ~400 MB of constants in the
    # relay's compile request (HTTP 413).
    import time as _time

    def chain_bench(name, fn, init, iters=100, donate=False, reps=3):
        # best of `reps`: relay-side dispatch/allocator state moves single
        # runs by 3x (measured 1.2 vs 4.2 ms for the identical copy loop)
        j = jax.jit(fn, donate_argnums=(0,) if donate else ())
        out = j(init)
        np.asarray(out[0].ravel()[0])
        best = None
        for _ in range(reps):
            t0 = _time.perf_counter()
            for _ in range(iters):
                out = j(out)
            np.asarray(out[0].ravel()[0])
            dt = (_time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name:44s} {best * 1e3:9.2f} ms", flush=True)
        return best

    # blur first: the donated copy consumes (deletes) the input buffers
    t_blur = chain_bench(
        "boxblur r13 (the flagship, chained)",
        lambda ps: tuple(vz.boxblur(
            vz.Clip.from_planes(ps, vz.get_format("YUV420P16")),
            hradius=13, vradius=13).planes),
        tuple(y16_b.planes))
    t_copy = chain_bench(
        "HBM copy floor (chained+donated, all planes)",
        lambda ps: tuple(p + jnp.uint16(1) for p in ps),
        tuple(y16_b.planes), donate=True)
    gbs = 2 * nbytes / t_copy / 1e9
    print(f"  -> copy moves {2 * nbytes / 1e6:.0f} MB in {t_copy * 1e3:.2f} "
          f"ms = {gbs:.0f} GB/s effective (v5e HBM peak 819, so the relay "
          f"is NOT the bandwidth limiter); blur/copy ratio "
          f"{t_blur / t_copy:.2f}x = V+H arithmetic on top of pure "
          f"traffic (see the round-4 breakdown below)",
          flush=True)
    # Round-4 measured breakdown (VERDICT r3 weak #7), chained dispatch,
    # batch 64 YUV420P16 1080p on one v5e behind the relay:
    #   copy chained+donated   1.22-1.27 ms/call = 627-652 GB/s (80% of
    #     roofline) -> the relay/dispatch path is NOT the limiter; the
    #     achievable-bandwidth ceiling is essentially the hardware's.
    #   boxblur r13 chained    4.43 ms (14.4k fps) = 3.5x the copy floor;
    #     donation does not help the blur (5.09 ms — in-place aliasing
    #     constrains the fused kernel's scheduling); luma alone 3.18 ms.
    # Closing attempts (both bit-exact, kept in git history, reverted):
    #   * V window sums via sequential 8-row-chunk prefix scan in VMEM:
    #     radius-flat but 1/8 sublane utilization -> 3.2-4.0 ms luma
    #     (banded matmul: 2.45 ms at r13, 6.5 ms at r22).
    #   * V prefix as a full L x L ones-triangle MXU matmul (u8 limbs):
    #     perfectly radius-flat 4.0 ms, but the L^2 contraction costs more
    #     than the banded r<=22 matmul it replaced; flagship regressed
    #     14.4k -> 9.5k fps and was reverted.
    # Per-call dispatch floor (round 4): a tiny-op chained loop runs at
    # 0.27 ms/call and a 66 MB pointwise op at 0.33 ms — dispatch and
    # device execution OVERLAP on the relay (per-call wall time is their
    # max, not sum), so sub-millisecond ops are dispatch-rate-bound and
    # batch size is the lever, not kernel fusion.
    # Standing conclusion: the remaining 3.5x over pure traffic is V+H
    # arithmetic (band matmuls + fixed-point limb math) that scales with
    # the work, not dispatch overhead; the banded-matmul formulation is
    # the best of the three measured designs at production radii.

    # ---------------- EEDI3 hp vs non-hp ----------------
    e_in = vz.Clip.from_planes(
        (rng.random((8, 540, 1920), dtype=np.float32),),
        vz.get_format("GRAYS")).device()
    t_nh = bench("eedi3 dh (41 directions)",
                 lambda c: vz.eedi3(c, field=1, dh=True), e_in)
    t_hp = bench("eedi3 hp dh (81 directions)",
                 lambda c: vz.eedi3(c, field=1, dh=True, hp=True), e_in)
    print(f"  -> hp/non-hp ratio {t_hp / t_nh:.2f}x vs 81/41 = 1.98x "
          f"alphabet scaling (ratio <= 1.98 means hp runs at no worse "
          f"per-direction efficiency than the tuned non-hp kernel)",
          flush=True)


if __name__ == "__main__":
    main()
