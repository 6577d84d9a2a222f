"""Unit tests for the VCL2 transcendental ports (vszip_tpu/ops/vcl.py,
reference src/vcl.zig) — accuracy against float64 NumPy and the special
cases the Zig kernels define."""

import numpy as np
import pytest

from vszip_tpu.ops.vcl import atan, cbrt, pow_


def test_pow_accuracy_unit_interval():
    """Deband m6/m7 call pow(product, 0.1) with product in [0,1]
    (reference deband_int.zig:325); ~1-ulp accuracy there."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, 50000).astype(np.float32)
    got = np.asarray(pow_(x, 0.1))
    want = np.power(x.astype(np.float64), 0.1).astype(np.float32)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 3e-7


def test_pow_special_cases():
    """VCL2 pow_template_f zero handling (src/vcl.zig:163-179): x==+-0
    with y>0 -> 0, y==0 -> 1, y<0 -> inf."""
    x = np.asarray([0.0, -0.0, 1.0, 2.0], np.float32)
    assert np.asarray(pow_(x, 0.1))[0] == 0.0
    assert np.asarray(pow_(x, 0.1))[1] == 0.0
    assert np.asarray(pow_(x, 0.0))[0] == 1.0
    assert np.isinf(np.asarray(pow_(x, -1.0))[0])
    assert np.asarray(pow_(x, 0.1))[2] == pytest.approx(1.0, rel=1e-7)


def test_pow_general_range():
    rng = np.random.default_rng(1)
    x = rng.uniform(1e-6, 100.0, 20000).astype(np.float32)
    y = rng.uniform(-3.0, 3.0, 20000).astype(np.float32)
    got = np.asarray(pow_(x, y))
    want = np.power(x.astype(np.float64), y.astype(np.float64))
    ok = np.isfinite(want)
    rel = np.abs(got[ok] - want[ok]) / np.maximum(np.abs(want[ok]), 1e-30)
    assert np.quantile(rel, 0.999) < 1e-6
    assert rel.max() < 1e-5


def test_atan_accuracy_and_octants():
    """Deband m7's gradient angle is atan(gy/gx) over the full real line
    (deband_int.zig:411); the octant reduction must be seamless at the
    sqrt2 +- 1 breakpoints."""
    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.uniform(-100, 100, 20000),
        np.asarray([0.0, -0.0, 0.41421, 0.41422, 2.41421, 2.41422,
                    -0.41421, -2.41422, 1e8, -1e8]),
    ]).astype(np.float32)
    got = np.asarray(atan(x))
    want = np.arctan(x.astype(np.float64)).astype(np.float32)
    assert np.abs(got - want).max() < 2e-7
    # sign symmetry via copysign (src/vcl.zig:37)
    np.testing.assert_array_equal(np.asarray(atan(-x)), -got)


def test_cbrt_matches_reference_semantics():
    """cbrt underflows |x| <= 2^-126 to zero (src/vcl.zig:78-80) and is
    odd-symmetric."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-10, 10, 20000).astype(np.float32)
    got = np.asarray(cbrt(x))
    want = np.cbrt(x.astype(np.float64)).astype(np.float32)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 5e-7  # the 4-iteration Newton kernel's own accuracy
    tiny = np.asarray([1e-38, -1e-38, 0.0], np.float32)
    np.testing.assert_array_equal(np.asarray(cbrt(tiny)), [0.0, 0.0, 0.0])
