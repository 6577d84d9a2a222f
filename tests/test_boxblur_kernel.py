"""Pallas kernel vs jnp reference path, in interpreter mode on CPU.

The real-hardware bit-exactness check runs via the verify flow / bench on
the TPU chip; this keeps the kernel logic covered by the CPU suite.
"""

import numpy as np
import pytest

pl = pytest.importorskip("jax.experimental.pallas")


@pytest.mark.parametrize(
    "shape,radius,dtype",
    [
        ((2, 48, 160), 5, np.uint16),
        ((1, 40, 136), 3, np.uint8),
        ((1, 33, 77), 8, np.uint16),
        ((1, 7, 13, ), 2, np.uint8),
    ],
    ids=str,
)
def test_kernel_matches_jnp_interpret(shape, radius, dtype, monkeypatch):
    import jax.experimental.pallas as plmod
    import jax.numpy as jnp

    from vszip_tpu.kernels import boxblur_pallas as kp
    from vszip_tpu.ops.boxblur import _ct_blur_int

    orig = plmod.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(kp.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(11)
    x = jnp.asarray(
        rng.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    )
    got = np.asarray(kp.ct_blur_int_pallas(x, radius))
    want = np.asarray(_ct_blur_int(x, radius))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "shape,radius,dtype",
    [
        ((2, 48, 160), 5, np.uint16),
        ((1, 40, 136), 7, np.uint8),
        ((1, 33, 130), 1, np.uint16),
    ],
    ids=str,
)
def test_rt_kernels_match_jnp_interpret(shape, radius, dtype, monkeypatch):
    import jax
    import jax.experimental.pallas as plmod
    import jax.numpy as jnp

    from vszip_tpu.kernels import boxblur_pallas as kp
    from vszip_tpu.ops.boxblur import _fixed_point_output, _window_sums_i32

    orig = plmod.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(kp.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    )

    def ref(v, axis):
        w = _window_sums_i32(v, radius, axis)
        w0 = jax.lax.slice_in_dim(w, 0, 1, axis=axis)
        return _fixed_point_output(w, w0, radius, v.dtype)

    np.testing.assert_array_equal(
        np.asarray(kp.rt_blur_v_pallas(x, radius)), np.asarray(ref(x, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(kp.rt_blur_h_pallas(x, radius)), np.asarray(ref(x, 2))
    )


@pytest.mark.parametrize(
    "shape,radius,passes,dtype",
    [
        ((2, 96, 160), 5, 3, np.uint16),
        ((1, 80, 136), 13, 5, np.uint8),
        ((1, 67, 130), 3, 2, np.uint16),
        ((1, 300, 140), 22, 5, np.uint16),  # kblk == 2, partial last block
    ],
    ids=str,
)
def test_rt_v_multi_matches_jnp_interpret(shape, radius, passes, dtype,
                                          monkeypatch):
    import jax
    import jax.experimental.pallas as plmod
    import jax.numpy as jnp

    from vszip_tpu.kernels import boxblur_pallas as kp
    from vszip_tpu.ops.boxblur import _fixed_point_output, _window_sums_i32

    orig = plmod.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(kp.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    )

    want = x
    for _ in range(passes):
        w = _window_sums_i32(want, radius, 1)
        w0 = jax.lax.slice_in_dim(w, 0, 1, axis=1)
        want = _fixed_point_output(w, w0, radius, want.dtype)

    got = np.asarray(kp.rt_blur_v_multi_pallas(x, radius, passes, 64))
    np.testing.assert_array_equal(got, np.asarray(want))
