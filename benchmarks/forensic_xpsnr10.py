"""Forensic: the one remaining REF_EXCLUDE case — XPSNR ext 10-bit upscale.

Hypothesis (round 5): zimg resizes the 10-bit UPSCALE in its integer (u16,
i16 Q14 coefficient) pixel path after the depth conversion, while the 8-bit
target keeps the float path (BYTE has no native resize; integer staging
would cost two extra depth conversions).  The round-4 integer attempt
deviated 4.7e-2 — consistent with a DC shift from naive per-coefficient
weight quantization; with zimg's error-diffusion quantization the row sums
stay exactly 1<<14 and no DC shift occurs.

Run:  JAX_PLATFORMS=cpu python benchmarks/forensic_xpsnr10.py
"""

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import vsstd
import zimg_exact as ze
from vszip_tpu import Clip, get_format
from vszip_tpu.ops.xpsnr import xpsnr

GOLD = json.load(open("/root/reference/tests/goldens/xpsnr.json"))

W, H = 2560, 1440
SRC_W, SRC_H = 1880, 1040
FMT = get_format("YUV420P10")


def motion_rgb():
    from fixtures import _photo_planes

    planes = _photo_planes()
    shift = 6
    u8 = np.stack([
        np.stack([p[n * shift: n * shift + SRC_H, :SRC_W] for p in planes], 0)
        for n in range(3)
    ])  # (3 frames, 3 ch, H, W)
    return tuple(u8[:, c] for c in range(3))


def yuv_f32_at_source(rgb):
    rf, gf, bf = (ze.u8_to_f32(p) for p in rgb)
    return ze.rgb_to_yuv_f32(rf, gf, bf)


def pipeline_f32(rgb):
    """Current model: matrix at source res, f32 fused resize, quantize."""
    return ze.convert_rgb24(rgb, FMT, "bilinear", W, H)


def pipeline_int_up(rgb, rnd="even", chroma_stage="fused"):
    """matrix f32 at source -> quantize to 10-bit at source res (4:4:4) ->
    integer u16 resize: luma to (W, H); chroma per `chroma_stage`:
      fused      one integer resize 1880x1040 -> 1280x720, shift in source
                 units (-0.5 * src/dst)
      2stage     integer 444 upscale to (W, H) then integer subsample -0.5
      subfirst   f32 subsample at source res (shift -0.5) -> quantize ->
                 integer upscale 940x520 -> 1280x720 with the left-siting-
                 preserving shift 0.25*(1 - src/dst)
      fused_h    fused geometry but h-pass first (one order for the whole
                 resize node instead of the per-plane cost rule)
    """
    y, cb, cr = yuv_f32_at_source(rgb)
    y10 = ze.quantize_plane(y, 10, "luma", np.uint16)
    pmax = 1023
    out_y = ze.resize_plane_u16(y10, W, H, 0.0, 0.0, "bilinear", pmax, rnd)
    cw, ch = W // 2, H // 2
    sh = -0.5 * (SRC_W / W)
    out = [out_y]
    for c in (cb, cr):
        if chroma_stage == "subfirst":
            cs = ze.resize_plane(c, SRC_W // 2, SRC_H // 2, -0.5, 0.0,
                                 "bilinear")
            c10 = ze.quantize_plane(cs, 10, "chroma", np.uint16)
            out.append(ze.resize_plane_u16(
                c10, cw, ch, 0.25 * (1.0 - SRC_W / W), 0.0, "bilinear",
                pmax, rnd))
            continue
        c10 = ze.quantize_plane(c, 10, "chroma", np.uint16)
        if chroma_stage == "fused":
            out.append(ze.resize_plane_u16(c10, cw, ch, sh, 0.0, "bilinear",
                                           pmax, rnd))
        elif chroma_stage == "fused_h":
            out.append(ze.resize_plane_u16(c10, cw, ch, sh, 0.0, "bilinear",
                                           pmax, rnd, order="h"))
        elif chroma_stage == "2stage":
            c2 = ze.resize_plane_u16(c10, W, H, 0.0, 0.0, "bilinear", pmax,
                                     rnd)
            out.append(ze.resize_plane_u16(c2, cw, ch, -0.5, 0.0, "bilinear",
                                           pmax, rnd))
        else:
            raise SystemExit(f"unknown chroma_stage {chroma_stage}")
    return out


def score(planes):
    ref = Clip.from_planes(planes, FMT)
    dist = vsstd.boxblur(ref, hradius=2, vradius=2)
    out = xpsnr(ref, dist, temporal=True, fps=32)
    ys = np.asarray(out.props["XPSNR_Y"]).ravel()
    us = np.asarray(out.props["XPSNR_U"]).ravel()
    vs_ = np.asarray(out.props["XPSNR_V"]).ravel()
    return [{"Y": float(ys[n]), "U": float(us[n]), "V": float(vs_[n])}
            for n in range(3)]


def report(name, vals):
    worst = 0.0
    for n, v in enumerate(vals):
        g = GOLD[f"ext|uhd|2560x1440|YUV420P10|fps32|t1|n{n}"]
        rel = {k: abs(v[k] - g[k]) / abs(g[k]) for k in "YUV"}
        worst = max(worst, *rel.values())
        print(f"  n{n}: " + "  ".join(
            f"{k}={v[k]:.9f} (rel {rel[k]:.2e})" for k in "YUV"))
    print(f"{name}: worst rel {worst:.3e}  "
          f"{'PASS' if worst <= 1e-6 else 'fail'}")
    return worst


def main():
    rgb = motion_rgb()
    which = sys.argv[1:] or ["f32", "int_even"]
    results = {}
    for name in which:
        if name == "f32":
            planes = pipeline_f32(rgb)
        elif name == "hybrid":
            # diagnostic: integer luma + the f32 model's fused chroma
            pi = pipeline_int_up(rgb, "even")
            pf = pipeline_f32(rgb)
            planes = [pi[0], pf[1], pf[2]]
        elif name.startswith("int_"):
            _, rnd, *rest = name.split("_", 2)
            planes = pipeline_int_up(rgb, rnd, rest[0] if rest else "fused")
        else:
            raise SystemExit(f"unknown variant {name}")
        print(f"--- {name}")
        results[name] = report(name, score(planes))
    print(json.dumps({k: f"{v:.3e}" for k, v in results.items()}))


if __name__ == "__main__":
    main()
