"""Interpret-mode parity: fused EEDI3 kernel vs the XLA stages."""
import importlib
import numpy as np
import pytest

def test_fused_matches_xla_interpret(monkeypatch):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.experimental.pallas as plmod
    E = importlib.import_module("vszip_tpu.ops.eedi3")
    import vszip_tpu.kernels.eedi3_fused_pallas as K

    orig = plmod.pallas_call
    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)
    monkeypatch.setattr(K.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(3)
    B, L, W = 2, 9, 120
    mdis, nrad = 6, 2
    alpha, beta, gamma = 0.2, 0.25, 10.0
    omab = 1.0 - alpha - beta
    rows4 = [jnp.asarray(rng.random((B, L, W), np.float32)) for _ in range(4)]
    r3p, r1p, r1n, r3n = [E._pad_rows(r) for r in rows4]

    clist = E._costs_nonhp(r3p, r1p, r1n, r3n, mdis, nrad, alpha, beta, omab)
    tc = jnp.stack(clist, axis=0)
    fpath_ref = E._dp(tc, None, gamma, False)
    out_ref = E._output_nonhp(r3p, r1p, r1n, r3n, fpath_ref, W, mdis)

    out, fpath = K.eedi3_fused_pallas(r3p, r1p, r1n, r3n, W, mdis, nrad,
                                      alpha, beta, gamma)
    np.testing.assert_array_equal(np.asarray(fpath), np.asarray(fpath_ref))
    # the interpolation arithmetic is the same expression, but XLA's FMA
    # fusion decisions differ between the kernel and the reference graph
    # contexts: allow 1 ulp
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-7, atol=1e-7)


def test_fused_hp_matches_xla_interpret(monkeypatch):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.experimental.pallas as plmod
    E = importlib.import_module("vszip_tpu.ops.eedi3")
    import vszip_tpu.kernels.eedi3_fused_pallas as K

    orig = plmod.pallas_call
    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)
    monkeypatch.setattr(K.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(9)
    B, L, W = 2, 7, 104
    mdis, nrad = 5, 1
    alpha, beta, gamma = 0.25, 0.3, 4.0
    omab = 1.0 - alpha - beta
    rows4 = [jnp.asarray(rng.random((B, L, W), np.float32)) for _ in range(4)]
    r3p, r1p, r1n, r3n = [E._pad_rows(r) for r in rows4]

    clist = E._costs_hp(r3p, r1p, r1n, r3n, mdis, nrad, alpha, beta, omab)
    tc = jnp.stack(clist, axis=0)
    fpath_ref = E._dp(tc, None, gamma, True)
    out_ref = E._output_hp(r3p, r1p, r1n, r3n, fpath_ref, W, None, mdis)

    out, fpath = K.eedi3_fused_hp_pallas(r3p, r1p, r1n, r3n, W, mdis, nrad,
                                         alpha, beta, gamma)
    np.testing.assert_array_equal(np.asarray(fpath), np.asarray(fpath_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-7, atol=1e-7)


def test_fused_mclip_matches_xla_interpret(monkeypatch):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.experimental.pallas as plmod
    E = importlib.import_module("vszip_tpu.ops.eedi3")
    import vszip_tpu.kernels.eedi3_fused_pallas as K

    orig = plmod.pallas_call
    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)
    monkeypatch.setattr(K.pl, "pallas_call", interp_call)

    rng = np.random.default_rng(5)
    B, L, W = 2, 9, 120
    mdis, nrad = 6, 2
    alpha, beta, gamma = 0.2, 0.25, 10.0
    omab = 1.0 - alpha - beta
    rows4 = [jnp.asarray(rng.random((B, L, W), np.float32)) for _ in range(4)]
    r3p, r1p, r1n, r3n = [E._pad_rows(r) for r in rows4]
    mask = jnp.asarray(rng.integers(0, 2, (B, L, W)) > 0)

    clist = E._costs_nonhp(r3p, r1p, r1n, r3n, mdis, nrad, alpha, beta, omab)
    tc = jnp.stack(clist, axis=0)
    fpath_ref = E._dp(tc, mask, gamma, False)
    out_ref = E._output_nonhp(r3p, r1p, r1n, r3n, fpath_ref, W, mdis)

    out, fpath = K.eedi3_fused_pallas(r3p, r1p, r1n, r3n, W, mdis, nrad,
                                      alpha, beta, gamma, mask)
    np.testing.assert_array_equal(np.asarray(fpath), np.asarray(fpath_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-7, atol=1e-7)


def test_fused_segmented_matches_xla_interpret(monkeypatch):
    """Multi-segment cost build (the hp-at-1920 VMEM shape): force a tiny
    per-segment budget so the 15-chunk line splits into two x segments and
    verify the DP/backtrack walk across the segment boundary bit-matches
    the single-tensor XLA path."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.experimental.pallas as plmod
    E = importlib.import_module("vszip_tpu.ops.eedi3")
    import vszip_tpu.kernels.eedi3_fused_pallas as K

    orig = plmod.pallas_call
    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)
    monkeypatch.setattr(K.pl, "pallas_call", interp_call)
    monkeypatch.setattr(K, "_SEG_BUDGET", 300 * 1024)

    rng = np.random.default_rng(3)
    B, L, W = 2, 9, 120
    mdis, nrad = 6, 2
    alpha, beta, gamma = 0.2, 0.25, 10.0
    omab = 1.0 - alpha - beta
    rows4 = [jnp.asarray(rng.random((B, L, W), np.float32)) for _ in range(4)]
    r3p, r1p, r1n, r3n = [E._pad_rows(r) for r in rows4]
    wk = -((W - 1) // -8) * 8 + 1
    assert len(K._seg_plan(wk, 16, 128)) > 1

    clist = E._costs_nonhp(r3p, r1p, r1n, r3n, mdis, nrad, alpha, beta, omab)
    tc = jnp.stack(clist, axis=0)
    fpath_ref = E._dp(tc, None, gamma, False)
    out_ref = E._output_nonhp(r3p, r1p, r1n, r3n, fpath_ref, W, mdis)
    out, fpath = K.eedi3_fused_pallas(r3p, r1p, r1n, r3n, W, mdis, nrad,
                                      alpha, beta, gamma)
    np.testing.assert_array_equal(np.asarray(fpath), np.asarray(fpath_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-7, atol=1e-7)

    clist = E._costs_hp(r3p, r1p, r1n, r3n, mdis, nrad, alpha, beta, omab)
    tc = jnp.stack(clist, axis=0)
    fpath_ref = E._dp(tc, None, gamma, True)
    out_ref = E._output_hp(r3p, r1p, r1n, r3n, fpath_ref, W, None, mdis)
    out, fpath = K.eedi3_fused_hp_pallas(r3p, r1p, r1n, r3n, W, mdis, nrad,
                                         alpha, beta, gamma)
    np.testing.assert_array_equal(np.asarray(fpath), np.asarray(fpath_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-7, atol=1e-7)
