"""Validate the zimg-exact fixture conversion against the REFERENCE's own
golden values.

The reference goldens include cases whose stats are pure functions of the
converted input (Limiter clamp windows, PlaneAverage exclude=[-1]), so they
pin the fixture conversion itself (reference tests/goldens/limiter.json,
planeaverage.json).  Passing these at tight tolerances proves the repo's
fixtures reproduce `resize.Bilinear(format=..., matrix=1)` and makes every
other imported reference golden meaningful.

Integer min/max must match EXACTLY; integer plane averages match to within a
few round-to-nearest tie flips (assert <= 8 LSB total drift per plane, far
inside the goldens' rel=1e-6); float extrema match bit-exactly.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from fixtures import convert, source_rgb24

REF_GOLDENS = Path("/root/reference/tests/goldens")


def _ref(name: str) -> dict:
    return json.loads((REF_GOLDENS / f"{name}.json").read_text())


@pytest.fixture(scope="module")
def src():
    return source_rgb24()


# Limiter cases that clamp the converted input: (fmt, mins, maxs, golden key).
_LIMITER_PINS = [
    ("YUV420P8", [40, 20, 30], [200, 220, 190],
     "YUV420P8|full|max=[200,220,190],min=[40,20,30]"),
    ("YUV420P9", [100, 300, 100], [400, 450, 380],
     "YUV420P9|full|max=[400,450,380],min=[100,300,100]"),
    ("YUV420P10", [200, 100, 100], [800, 900, 850],
     "YUV420P10|full|max=[800,900,850],min=[200,100,100]"),
    ("YUV422P14", [3000, 9000, 2000], [12000, 14500, 12000],
     "YUV422P14|full|max=[12000,14500,12000],min=[3000,9000,2000]"),
    ("YUV444P12", [800, 2300, 600], [3000, 3600, 3000],
     "YUV444P12|full|max=[3000,3600,3000],min=[800,2300,600]"),
    ("YUV444P16", [8143, 0, 0], [56803, 65535, 65535],
     "YUV444P16|full|max=[56803,65535,65535],min=[8143,0,0]"),
    ("GRAY16", [10000], [50000], "GRAY16|full|max=[50000],min=[10000]"),
    ("GRAY9", [100], [400], "GRAY9|full|max=[400],min=[100]"),
    ("GRAY12", [800], [3000], "GRAY12|full|max=[3000],min=[800]"),
    ("GRAY14", [3000], [12000], "GRAY14|full|max=[12000],min=[3000]"),
]


@pytest.mark.parametrize(("fmt", "mins", "maxs", "key"),
                         _LIMITER_PINS, ids=lambda v: str(v)[:24])
def test_integer_conversion_pins(src, fmt, mins, maxs, key):
    golden = _ref("limiter")[key]
    clip = convert(src, fmt)
    peak = (1 << clip.format.bits_per_sample) - 1
    for i, plane in enumerate(clip.planes):
        arr = np.clip(np.asarray(plane)[0].astype(np.int64), mins[i], maxs[i])
        t = golden[f"p{i}"]
        assert int(arr.min()) == t["min"], f"{fmt} p{i} min"
        assert int(arr.max()) == t["max"], f"{fmt} p{i} max"
        drift_lsb = abs(float(arr.mean() / peak) - t["avg"]) * arr.size * peak
        assert drift_lsb <= 8.0, f"{fmt} p{i} avg drifts {drift_lsb:.1f} LSB"


def test_float_conversion_pins(src):
    """YUV420PS mask=1 clamps chroma to [0,1]: p1 min / p2 max are unclamped
    raw conversion extrema and must match bit-exactly; plane means must be
    inside a tiny fraction of the goldens' rel=1e-6."""
    golden = _ref("limiter")["YUV420PS|full|mask=1"]
    clip = convert(src, "YUV420PS")
    for i, (lo, hi) in enumerate([(0.0, 1.0)] * 3):
        arr = np.clip(np.asarray(clip.planes[i])[0], np.float32(lo), np.float32(hi))
        t = golden[f"p{i}"]
        assert float(arr.min()) == t["min"], f"p{i} min"
        assert float(arr.max()) == t["max"], f"p{i} max"
        assert float(arr.astype(np.float64).mean()) == pytest.approx(t["avg"], rel=1e-8)


def test_planeaverage_pins(src):
    pa = _ref("planeaverage")
    singles = {
        "GRAY8": pa["GRAY8|full|exclude=[-1]"]["avg"],
        "GRAY16": pa["GRAY16|full|exclude=[-1]"]["avg"],
        "GRAYH": pa["GRAYH|full|exclude=[-1]"]["avg"],
        "GRAYS": pa["GRAYS|full|exclude=[-1]"]["avg"],
        "RGBS": pa["RGBS|full|exclude=[-1]"]["avg"],
        "RGB24": pa["RGB24|full|exclude=[-1]"]["avg"],
    }
    for fmt, target in singles.items():
        clip = convert(src, fmt)
        arr = np.asarray(clip.planes[0])[0]
        if clip.format.sample_type.name == "INTEGER":
            peak = (1 << clip.format.bits_per_sample) - 1
            avg = float(arr.astype(np.float64).mean() / peak)
        else:
            avg = float(arr.astype(np.float64).mean())
        assert avg == pytest.approx(target, rel=1e-9), fmt

    t420 = pa["YUV420P8|full|exclude=[-1],planes=[0,1,2]"]["avg"]
    clip = convert(src, "YUV420P8")
    for i, target in enumerate(t420):
        arr = np.asarray(clip.planes[i])[0]
        avg = float(arr.astype(np.float64).mean() / 255)
        assert avg == pytest.approx(target, rel=3e-7), f"YUV420P8 p{i}"
