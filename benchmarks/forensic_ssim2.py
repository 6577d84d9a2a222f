"""Forensic: the SSIMULACRA2 0.08-abs-floor blur1 cases.

Mirrors the round-5 XPSNR forensic: model the reference's internal
YUV -> RGBS conversion (helper.zig toRGBS via zimg) HOST-side at ulp
fidelity, feed the resulting RGBS planes straight to the op (which then
matches the reference to <=0.003 on RGBS inputs), and compare each
conversion variant against the REFERENCE golden scores for the failing
cases.

Variants (chroma-upsample path x int->float depth style x matrix style):
  up:   int   (Q14 integer upsample at storage depth — the op's current path)
        f32   (dual-chain f64-emulated-FMA float upsample, zimg AVX2 order)
  dep:  submul  (x - lo) * f32(1/rng)
        lut     f32(double((x - lo) / rng))   (per-value double LUT)
        fma     fma(x, f32(1/rng), f32(-lo/rng))
  mat:  fma   r = fma(m2, v, fma(m1, u, m0*y)) chain
        plain r = y + c*v in f32 (the op's current order)

Run:  JAX_PLATFORMS=cpu python benchmarks/forensic_ssim2.py [variants...]
Variant syntax: up,dep,mat e.g. f32,lut,fma
"""

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import zimg_exact as ze
from vszip_tpu import Clip, get_format

f32, f64 = np.float32, np.float64

GOLD = json.load(open("/root/reference/tests/goldens/ssimulacra2.json"))

CASES = [
    ("YUV420P8", "full"),
    ("YUV420P16", "full"),
    ("YUV420P16", "odd"),
    ("YUV420P16", "tiny"),
]


def fixture_yuv(fmt_name, geometry):
    from fixtures import convert, geometry_variant, source_rgb24

    return geometry_variant(convert(source_rgb24(), fmt_name), geometry)


def blur1(clip):
    import vsstd

    return vsstd.boxblur(clip, hradius=1, vradius=1)


def depth_to_float(x, lo, rng, style):
    xi = x.astype(f64)
    if style == "submul":
        return ((xi - lo).astype(f32).astype(f64) * f64(f32(1.0 / rng))
                ).astype(f32)
    if style == "lut":
        return ((xi - lo) / rng).astype(f32)
    if style == "fma":
        return (xi * f64(f32(1.0 / rng)) + f64(f32(-lo / rng))).astype(f32)
    raise ValueError(style)


def upsample_f32(c, w, h):
    """Catmull-Rom fused upsample, zimg dual-chain f32 semantics
    (ze._apply_taps), left-sited horizontal (+0.25), centered vertical."""
    ch, cw = c.shape[-2], c.shape[-1]
    hshift = 0.25 if cw != w else 0.0

    def do_h(x):
        if cw == w:
            return x
        left, wts = ze.compute_filter(cw, w, hshift, "bicubic")
        return ze._apply_taps(x, left, wts, x.ndim - 1)

    def do_v(x):
        if ch == h:
            return x
        left, wts = ze.compute_filter(ch, h, 0.0, "bicubic")
        return ze._apply_taps(x, left, wts, x.ndim - 2)

    if ze.resize_h_first(w / cw, h / ch):
        return do_v(do_h(c))
    return do_h(do_v(c))


def upsample_int(c, w, h, bits):
    ch, cw = c.shape[-2], c.shape[-1]
    pmax = (1 << bits) - 1
    hshift = 0.25 if cw != w else 0.0
    return ze.resize_plane_u16(c.astype(np.uint16), w, h, hshift, 0.0,
                               "bicubic", pmax)


def yuv_to_rgbs(clip, up, dep, mat):
    fmt = clip.format
    bits = fmt.bits_per_sample
    sh = bits - 8
    w, h = clip.width, clip.height
    y8 = np.asarray(clip.planes[0])
    u8 = np.asarray(clip.planes[1])
    v8 = np.asarray(clip.planes[2])

    y = depth_to_float(y8, 16 << sh, 219 << sh, dep)
    if up == "int":
        ui = upsample_int(u8, w, h, bits)
        vi = upsample_int(v8, w, h, bits)
        u = depth_to_float(ui, 128 << sh, 224 << sh, dep)
        v = depth_to_float(vi, 128 << sh, 224 << sh, dep)
    else:
        u = upsample_f32(depth_to_float(u8, 128 << sh, 224 << sh, dep), w, h)
        v = upsample_f32(depth_to_float(v8, 128 << sh, 224 << sh, dep), w, h)

    kr, kb = 0.2126, 0.0722  # fixtures stamp _Matrix=1 (BT.709)
    kg = 1.0 - kr - kb
    cr_r = 2.0 * (1.0 - kr)
    cb_b = 2.0 * (1.0 - kb)
    cb_g = -2.0 * (1.0 - kb) * kb / kg
    cr_g = -2.0 * (1.0 - kr) * kr / kg

    if mat == "fma":
        r = ze.fma(v, f32(cr_r), y)
        g = ze.fma(v, f32(cr_g), ze.fma(u, f32(cb_g), y))
        b = ze.fma(u, f32(cb_b), y)
    else:
        r = (y.astype(f64) + f64(f32(cr_r)) * v.astype(f64)).astype(f32)
        g = (y.astype(f64) + (f64(f32(cb_g)) * u.astype(f64)).astype(f32)
             .astype(f64)
             + (f64(f32(cr_g)) * v.astype(f64)).astype(f32).astype(f64)
             ).astype(f32)
        b = (y.astype(f64) + f64(f32(cb_b)) * u.astype(f64)).astype(f32)
    props = {k: vv for k, vv in clip.props.items() if k != "_Matrix"}
    return Clip.from_planes((r, g, b), get_format("RGBS"), props)


def main():
    from vszip_tpu.ops.ssimulacra2 import ssimulacra2

    variants = sys.argv[1:] or ["base", "f32,submul,plain", "f32,lut,fma"]
    results = {}
    for var in variants:
        print(f"--- {var}")
        worst = 0.0
        for fmt_name, geo in CASES:
            ref = fixture_yuv(fmt_name, geo)
            dist = blur1(ref)
            if var == "base":
                out = ssimulacra2(ref, dist)
            else:
                up, dep, mat = var.split(",")
                out = ssimulacra2(yuv_to_rgbs(ref, up, dep, mat),
                                  yuv_to_rgbs(dist, up, dep, mat))
            score = float(np.asarray(out.props["SSIMULACRA2"])[0])
            gold = GOLD[f"{fmt_name}|{geo}|dist=blur1"]
            d = abs(score - gold)
            worst = max(worst, d)
            print(f"  {fmt_name}|{geo}: {score:.6f} vs {gold:.6f} "
                  f"(abs {d:.4f})")
        results[var] = worst
        print(f"{var}: worst abs {worst:.4f}  "
              f"{'PASS' if worst <= 0.01 else 'fail'}")
    print(json.dumps({k: round(v, 5) for k, v in results.items()}))


if __name__ == "__main__":
    main()
