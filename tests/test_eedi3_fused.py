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
                                      alpha, beta, gamma, bmask=mask)
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


def _vcheck_both_paths(monkeypatch, *, hp, vcheck, use_scp, dh, field,
                       seed, vthresh=(32.0, 64.0, 4.0)):
    """Run ops.eedi3._vcheck through the lax.scan path and the fused
    Pallas sweep (interpret mode) on identical inputs; return both."""
    from functools import partial
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    E = importlib.import_module("vszip_tpu.ops.eedi3")
    KV = importlib.import_module("vszip_tpu.kernels.vcheck_pallas")

    rng = np.random.default_rng(seed)
    B, W, mdis = 2, 120, 4
    n_src = 6 if dh else 12
    n_interp = n_src if dh else n_src // 2
    n_dst = n_src * 2 if dh else n_src

    src = jnp.asarray(rng.random((B, n_src, W), np.float32))
    dst = jnp.asarray(rng.random((B, n_dst, W), np.float32))
    drange = 2 * mdis if hp else mdis
    dmap = jnp.asarray(
        rng.integers(-drange, drange + 1, (B, n_interp, W)), jnp.int32)
    scp = (jnp.asarray(rng.random((B, n_dst, W), np.float32))
           if use_scp else None)

    args = (src, dst, scp, dmap, field, n_interp, n_dst, n_src, dh, hp,
            vcheck, vthresh[0], vthresh[1], vthresh[2], W, mdis)

    monkeypatch.setattr(E, "_dp_on_tpu", lambda: False)
    ref = np.asarray(E._vcheck(*args))

    monkeypatch.setattr(E, "_dp_on_tpu", lambda: True)
    monkeypatch.setattr(KV, "vcheck_pallas",
                        partial(KV.vcheck_pallas, interpret=True))
    got = np.asarray(E._vcheck(*args))
    return ref, got


@pytest.mark.parametrize("hp", [False, True])
@pytest.mark.parametrize("vcheck", [1, 2, 3])
def test_vcheck_kernel_matches_scan_interpret(monkeypatch, hp, vcheck):
    ref, got = _vcheck_both_paths(
        monkeypatch, hp=hp, vcheck=vcheck, use_scp=False, dh=False,
        field=1, seed=11 + vcheck + 10 * hp)
    np.testing.assert_allclose(got, ref, rtol=2e-7, atol=1e-7)


@pytest.mark.parametrize("dh,field", [(True, 0), (False, 0)])
def test_vcheck_kernel_sclip_dh_interpret(monkeypatch, dh, field):
    ref, got = _vcheck_both_paths(
        monkeypatch, hp=False, vcheck=2, use_scp=True, dh=dh, field=field,
        seed=7 + dh)
    np.testing.assert_allclose(got, ref, rtol=2e-7, atol=1e-7)


@pytest.mark.parametrize("hp", [False, True])
def test_interp_all_fused_matches_xla_scaled_params(monkeypatch, hp):
    """Production-path parity: drive _interp_all (which passes the SCALED
    alpha/3 and beta/255 cost coefficients plus the separately-computed
    one_minus_ab) with the fused path forced on, and compare against the
    XLA path.  Guards the omab plumbing: round 3's eedi3_photo on-chip
    failure was the fused wrapper recomputing one_minus_ab from the scaled
    pair, which the kernel-level tests (unscaled args) could not catch."""
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

    rng = np.random.default_rng(11)
    B, L, W = 2, 9, 120
    mdis, nrad = 6, 2
    alpha, beta, gamma = 0.2, 0.25, 20.0  # reference defaults
    one_minus_ab = np.float32(1.0) - np.float32(alpha) - np.float32(beta)
    a_s, b_s, g_s = alpha / 3.0, beta / 255.0, gamma / 255.0
    params = (mdis, nrad, float(np.float32(a_s)), float(np.float32(b_s)),
              float(np.float32(g_s)), float(one_minus_ab))
    rows4 = tuple(jnp.asarray(rng.random((B, L, W), np.float32))
                  for _ in range(4))
    dummy_mask = jnp.zeros((1,), jnp.uint8)

    monkeypatch.setattr(E, "_dp_on_tpu", lambda: False)
    out_ref, fp_ref = E._interp_all(rows4, dummy_mask, None, params, hp, W,
                                    False)
    out_ref, fp_ref = np.asarray(out_ref), np.asarray(fp_ref)

    E._interp_all.clear_cache()
    monkeypatch.setattr(E, "_dp_on_tpu", lambda: True)
    out, fp = E._interp_all(rows4, dummy_mask, None, params, hp, W, False)
    E._interp_all.clear_cache()

    np.testing.assert_array_equal(np.asarray(fp), fp_ref)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-7,
                               atol=1e-7)
