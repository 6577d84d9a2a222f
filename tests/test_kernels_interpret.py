"""Interpret-mode parity for the CLAHE and XPSNR Pallas kernels on CPU.

The real-hardware checks run via the verify flow on the TPU chip; these
keep the kernel logic covered by the CPU suite (same scheme as
test_boxblur_kernel.py).
"""

import numpy as np
import pytest

pl = pytest.importorskip("jax.experimental.pallas")


@pytest.fixture
def interp(monkeypatch):
    import jax.experimental.pallas as plmod

    orig = plmod.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    def patch(mod):
        monkeypatch.setattr(mod.pl, "pallas_call", interp_call)

    return patch


def test_clahe8_kernel_matches_xla_chain(interp, monkeypatch):
    import importlib

    import jax.numpy as jnp

    from vszip_tpu.kernels import clahe_pallas as kp

    cop = importlib.import_module("vszip_tpu.ops.clahe")
    bb = importlib.import_module("vszip_tpu.ops.boxblur")

    interp(kp)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 256, (2, 128, 256), dtype=np.uint8))

    # force the pallas path (tile_h=32 % 8 == 0, wp % 128 == 0 for 4x4)
    monkeypatch.setattr(bb, "_on_tpu", lambda: True)
    got = np.asarray(cop._clahe_plane(x, 7, 4, 4, 8))
    monkeypatch.setattr(bb, "_on_tpu", lambda: False)
    cop._clahe_plane.clear_cache()
    want = np.asarray(cop._clahe_plane(x, 7, 4, 4, 8))
    np.testing.assert_array_equal(got, want)


def test_xpsnr_kernels_match_jnp(interp):
    import jax.numpy as jnp

    from vszip_tpu.kernels import xpsnr_pallas as kp
    from vszip_tpu.ops.xpsnr import (_block_sum, _lap_map, _tempdiff_map)
    import jax

    interp(kp)
    rng = np.random.default_rng(11)
    n, h, w = 3, 150, 256  # 64-blocks with a ragged last band
    org = jnp.asarray(rng.integers(0, 1024, (n, h, w), dtype=np.uint16))
    rec = jnp.asarray(rng.integers(0, 1024, (n, h, w), dtype=np.uint16))
    nbw = -(w // -64)

    sse, sa, ta = kp.luma_stats_pallas(org, rec, 1, True, nbw)

    diff = org.astype(jnp.int32) - rec.astype(jnp.int32)
    want_sse = _block_sum(diff * diff, 64)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    active = ((xs >= 1) & (xs < w - 1) & (ys >= 1) & (ys < h - 1))[None]
    want_sa = _block_sum(jnp.where(active, _lap_map(org), 0), 64)
    p1 = jnp.concatenate([jnp.zeros_like(org[:1]), org[:-1]], axis=0)
    want_ta = _block_sum(_tempdiff_map(org, p1, p1, 1), 64)

    np.testing.assert_array_equal(np.asarray(sse), np.asarray(want_sse))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(want_sa))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(want_ta))

    # chroma: rectangular blocks, ragged both ways
    co = jnp.asarray(rng.integers(0, 1024, (n, 75, 128), dtype=np.uint16))
    cr = jnp.asarray(rng.integers(0, 1024, (n, 75, 128), dtype=np.uint16))
    got = kp.chroma_sse_pallas(co, cr, 32, 32, nbw)
    dc = co.astype(jnp.int32) - cr.astype(jnp.int32)
    want = _block_sum(dc * dc, 32, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_checkmate_kernel_matches_jnp(interp):
    import importlib

    import jax.numpy as jnp

    from vszip_tpu.kernels import checkmate_pallas as kp

    C = importlib.import_module("vszip_tpu.ops.checkmate")
    interp(kp)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (4, 70, 130), dtype=np.uint8))
    for thr, tmax, tthr2 in [(12, 12, 0), (12, 12, 5), (20, 30, 0)]:
        use = tthr2 > 0
        got = np.asarray(kp.checkmate_pallas(x, thr, tmax, tthr2, use))
        p1 = C._frame_shift(x, -1)
        n1 = C._frame_shift(x, 1)
        p2 = C._frame_shift(x, -2) if use else x
        n2 = C._frame_shift(x, 2) if use else x
        want = np.asarray(
            C._checkmate_plane(x, p1, n1, p2, n2, thr, tmax, tthr2, use))
        np.testing.assert_array_equal(got, want)


def test_comb_mask_kernel_matches_jnp(interp):
    import importlib

    import jax.numpy as jnp

    from vszip_tpu.kernels import comb_mask_pallas as kp

    C = importlib.import_module("vszip_tpu.ops.comb_mask")
    interp(kp)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (3, 70, 130), dtype=np.uint8))
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
    for metric, mthresh, expand in [(False, 9, True), (True, 9, True),
                                    (False, 0, True), (False, 9, False)]:
        cth6 = 0 if metric else 6 * 6
        got = np.asarray(kp.comb_mask_pallas(x, 6, cth6, mthresh, metric,
                                             expand))
        want = np.asarray(
            C._comb_mask_plane(x, prev, 6, cth6, mthresh, metric, expand))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", [1, 3, 4, 5, 6])
def test_deband_band_kernel_matches_oracle(interp, mode):
    """The fused separable-mode band kernel vs the literal NumPy oracle
    (bit-exact: integer mode arithmetic on identically resolved taps)."""
    import jax.numpy as jnp

    from oracle.deband_ref import deband_plane_ref
    from vszip_tpu.kernels import deband_pallas as kp

    interp(kp)
    rng = np.random.default_rng(11)
    H, W = 96, 256
    x = rng.integers(0, 65536, (2, H, W), dtype=np.uint16)
    ys = np.minimum(np.arange(H), H - 1 - np.arange(H))[:, None]
    xs = np.minimum(np.arange(W), W - 1 - np.arange(W))[None, :]
    cap = np.minimum(15, np.minimum(ys, xs))
    v = np.minimum(rng.integers(0, 16, (H, W)), cap).astype(np.int32)
    thr3 = (12337, 12337, 12337)

    got = np.asarray(kp.deband_center_pallas(
        jnp.asarray(x), jnp.asarray(v), mode, True, 15, thr3))

    zero = np.zeros_like(v)
    if mode == 1:
        pre = dict(ref1_dy=v, ref1_dx=zero, ref2_dy=zero, ref2_dx=zero)
    elif mode == 3:
        pre = dict(ref1_dy=zero, ref1_dx=v, ref2_dy=zero, ref2_dx=zero)
    else:
        pre = dict(ref1_dy=v, ref1_dx=zero, ref2_dy=zero, ref2_dx=v)
    pre["grain_y"] = np.zeros(W * H + 64, np.int16)
    for n in range(x.shape[0]):
        want = deband_plane_ref(
            x[n], pre, False, mode, True, False, thr3, (0, 65535),
            1.5, 0.15, W, "grain_y")
        np.testing.assert_array_equal(got[n], want)


@pytest.mark.parametrize(
    "kwargs",
    [dict(radius=6, subspl=2), dict(radius=6), dict(radius=6, subspl=8)],
    ids=["dense", "subspl0", "subspl8"],
)
def test_bilateral_dither_kernels_match_xla(interp, monkeypatch, kwargs):
    """Both BilateralDither Pallas kernels (dense window + subspl point
    lists) vs the XLA chain, through the public op."""
    import importlib

    import numpy as np

    from vszip_tpu import Clip, get_format
    from vszip_tpu.kernels import bilateral_dither_pallas as kp

    bd = importlib.import_module("vszip_tpu.ops.bilateral_dither")
    bb = importlib.import_module("vszip_tpu.ops.boxblur")

    interp(kp)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 65536, (1, 64, 128), dtype=np.uint16)
    clip = Clip.from_planes((x,), get_format("GRAY16"))

    monkeypatch.setattr(bb, "_on_tpu", lambda: True)
    bd._dense.clear_cache()
    got = np.asarray(bd.bilateral_dither(clip, **kwargs).planes[0])
    monkeypatch.setattr(bb, "_on_tpu", lambda: False)
    bd._dense.clear_cache()
    want = np.asarray(bd.bilateral_dither(clip, **kwargs).planes[0])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "codec,kw",
    [("mpeg2", dict(qscale=8, dc_prec=0)),
     ("mpeg2", dict(qscale=4, dc_prec=2)),
     ("jpeg", dict(quality=50)),
     ("jpeg", dict(quality=10))],
)
def test_compress_kernel_matches_xla(interp, codec, kw):
    import importlib

    import jax.numpy as jnp

    from vszip_tpu.kernels import compress_pallas as kp

    cop = importlib.import_module("vszip_tpu.ops.compress")

    interp(kp)
    rng = np.random.default_rng(3)
    h, w = 2 * kp.BH, 128
    x = rng.integers(0, 256, (2, h, w), dtype=np.uint8)

    qscale = kw.get("qscale", 8)
    dc_prec = kw.get("dc_prec", 0)
    quality = kw.get("quality", 50)
    qa64, qb64, wide, consts = cop._quant_setup(codec, qscale, dc_prec,
                                                quality, False)
    assert not wide
    level = 128 if codec == "jpeg" else 0
    qa_t = jnp.asarray(cop._tile_plane(qa64, kp.BH, w, np.int32)[0])
    qb_t = jnp.asarray(cop._tile_plane(qb64, kp.BH, w, np.int32)[0])
    got = np.asarray(kp.compress_plane_pallas(
        jnp.asarray(x), qa_t, qb_t, codec, consts, level))
    want = np.asarray(cop._compress_plane(
        jnp.asarray(x), codec, qscale, dc_prec, (quality, False)))
    np.testing.assert_array_equal(got, want)


def test_ssim_sums_kernel_matches_xla(interp):
    import importlib

    import jax.numpy as jnp

    from vszip_tpu.kernels import ssim_pallas as kp

    sop = importlib.import_module("vszip_tpu.ops.ssimulacra2")

    interp(kp)
    rng = np.random.default_rng(5)
    # 130 rows: the trailing-rule rows straddle the last two 64-row bands
    im1 = jnp.asarray(rng.random((2, 130, 131), dtype=np.float32))
    im2 = jnp.asarray(rng.random((2, 130, 131), dtype=np.float32))
    for ns, ne in [(True, True), (True, False), (False, True)]:
        got = np.asarray(kp.ssim_sums_pallas(im1, im2, ns, ne))
        want = np.stack(
            [np.asarray(v) for v in sop._plane_sums_xla(im1, im2, ns, ne)],
            axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("blur_first", [True, False], ids=["bf", "nobf"])
def test_deband_m2_kernel_matches_oracle(interp, blur_first):
    """The fused m2 joint-alphabet band kernel vs the literal NumPy oracle
    (bit-exact integer avg_4 arithmetic on identically resolved taps)."""
    import jax.numpy as jnp

    from oracle.deband_ref import deband_plane_ref
    from vszip_tpu.kernels import deband_m2_pallas as kp

    interp(kp)
    rng = np.random.default_rng(7)
    H, W, R = 96, 256, 15
    x = rng.integers(0, 65536, (3, H, W), dtype=np.uint16)
    ys = np.minimum(np.arange(H), H - 1 - np.arange(H))[:, None]
    xs = np.minimum(np.arange(W), W - 1 - np.arange(W))[None, :]
    cap = np.minimum(R, np.minimum(ys, xs))
    v1 = np.clip(rng.integers(-R, R + 1, (H, W)), -cap, cap).astype(np.int32)
    v2 = np.clip(rng.integers(-R, R + 1, (H, W)), -cap, cap).astype(np.int32)
    thr = 12337

    key = jnp.asarray((v1 + R) * (2 * R + 1) + (v2 + R))
    got = np.asarray(kp.deband_m2_center_pallas(
        jnp.asarray(x), key, blur_first, R, thr))

    pre = dict(ref1_dy=v2, ref1_dx=v1, ref2_dy=-v1, ref2_dx=v2,
               grain_y=np.zeros(W * H + 64, np.int16))
    for n in range(x.shape[0]):
        want = deband_plane_ref(
            x[n], pre, False, 2, blur_first, False, (thr, 0, 0),
            (0, 65535), 1.5, 0.15, W, "grain_y")
        np.testing.assert_array_equal(got[n], want, err_msg=f"frame {n}")
