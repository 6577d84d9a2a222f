"""Multi-chip frame sharding (SURVEY §2.3): filters run unchanged on a
frames-sharded clip, results match the unsharded run, spatial filters keep
the sharding (no resharding collectives), and metric reductions cross the
mesh correctly.  Runs on the 8-virtual-device CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from vszip_tpu import Clip, get_format
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.checkmate import checkmate
from vszip_tpu.ops.limiter import limiter
from vszip_tpu.ops.planeaverage import plane_average
from vszip_tpu.ops.planeminmax import plane_minmax
from vszip_tpu.parallel.mesh import frames_mesh, shard_clip


@pytest.fixture(scope="module")
def mesh():
    # No skip: conftest guarantees the 8-device CPU mesh; frames_mesh raises
    # (= test failure, not green-washed skip) if it is not actually there.
    return frames_mesh(8)


@pytest.fixture()
def clip8():
    rng = np.random.default_rng(7)
    planes = tuple(
        rng.integers(0, 256, (8, 48 >> (p > 0), 64 >> (p > 0)), dtype=np.uint8)
        for p in range(3)
    )
    return Clip.from_planes(planes, get_format("YUV420P8"))


def _np(clip):
    return [np.asarray(p) for p in clip.planes]


def test_spatial_filter_matches_unsharded(mesh, clip8):
    ref = boxblur(clip8, hradius=3, vradius=3)
    sharded = shard_clip(clip8, mesh)
    out = jax.jit(lambda c: boxblur(c, hradius=3, vradius=3))(sharded)
    for a, b in zip(_np(ref), _np(out)):
        np.testing.assert_array_equal(a, b)
    # frames stay sharded: no gather back to one device
    spec = out.planes[0].sharding.spec
    assert spec[0] == "frames"


def test_chained_pipeline_sharded(mesh, clip8):
    def pipe(c):
        return limiter(boxblur(c, hradius=2, vradius=2), tv_range=True)

    ref = pipe(clip8)
    out = jax.jit(pipe)(shard_clip(clip8, mesh))
    for a, b in zip(_np(ref), _np(out)):
        np.testing.assert_array_equal(a, b)


def test_temporal_filter_sharded(mesh, clip8):
    """Checkmate reads +-2 frames; the batched formulation's frame shifts
    become cross-shard collectives that jit inserts automatically."""
    ref = checkmate(clip8)
    out = jax.jit(checkmate)(shard_clip(clip8, mesh))
    np.testing.assert_array_equal(_np(ref)[0], _np(out)[0])


def test_metric_reduction_sharded(mesh, clip8):
    ref = plane_average(clip8, planes=[0]).props["psmAvg"]
    got = plane_average(shard_clip(clip8, mesh), planes=[0]).props["psmAvg"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
    r2 = plane_minmax(clip8, planes=[0]).props
    g2 = plane_minmax(shard_clip(clip8, mesh), planes=[0]).props
    np.testing.assert_array_equal(np.asarray(g2["psmMin"]), np.asarray(r2["psmMin"]))
    np.testing.assert_array_equal(np.asarray(g2["psmMax"]), np.asarray(r2["psmMax"]))


def test_xpsnr_sharded_matches_unsharded(mesh):
    """XPSNR is the one true cross-shard reduction (SURVEY §2.3): per-frame
    temporal terms read n-1/n-2 across shard boundaries and the end-of-run
    average reduces over the whole mesh."""
    from vszip_tpu.ops.xpsnr import xpsnr

    rng = np.random.default_rng(11)
    ref_p = tuple(
        rng.integers(0, 256, (8, 48 >> (p > 0), 64 >> (p > 0)),
                     dtype=np.uint8) for p in range(3))
    dist_p = tuple(
        np.clip(p.astype(np.int32) + rng.integers(-9, 9, p.shape), 0, 255)
        .astype(np.uint8) for p in ref_p)
    fmt = get_format("YUV420P8")
    ref = Clip.from_planes(ref_p, fmt)
    dist = Clip.from_planes(dist_p, fmt)
    want = xpsnr(ref, dist, fps=32)
    got = xpsnr(shard_clip(ref, mesh), shard_clip(dist, mesh), fps=32)
    for k in ("XPSNR_Y", "XPSNR_U", "XPSNR_V", "XPSNR_AVG"):
        np.testing.assert_allclose(np.asarray(got.props[k]),
                                   np.asarray(want.props[k]),
                                   rtol=1e-12, atol=0)


def test_ssimulacra2_sharded_matches_unsharded(mesh):
    from vszip_tpu.ops.ssimulacra2 import ssimulacra2

    rng = np.random.default_rng(12)
    a_p = tuple(rng.random((8, 40, 48), np.float32) for _ in range(3))
    b_p = tuple(np.clip(p + rng.normal(0, 0.02, p.shape).astype(np.float32),
                        0, 1) for p in a_p)
    fmt = get_format("RGBS")
    a, b = Clip.from_planes(a_p, fmt), Clip.from_planes(b_p, fmt)
    want = np.asarray(ssimulacra2(a, b).props["SSIMULACRA2"])
    got = np.asarray(
        ssimulacra2(shard_clip(a, mesh), shard_clip(b, mesh))
        .props["SSIMULACRA2"])
    # scores are per-frame (no cross-frame reduction), but sharding changes
    # XLA's tiling of the f32 plane reductions -> reassociation at ~5e-7
    # rel (measured); bound well inside the reference's own score
    # tolerance (rel 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0)


def test_eedi3_sharded_matches_unsharded(mesh):
    """EEDI3 is pure batch parallelism over frames: sharded run must be
    bit-equal and stay frames-sharded (no resharding collectives)."""
    from vszip_tpu.ops.eedi3 import eedi3

    rng = np.random.default_rng(13)
    x = rng.random((8, 24, 32), dtype=np.float32)
    clip = Clip.from_planes((x,), get_format("GRAYS"))
    want = eedi3(clip, field=1, dh=True, vcheck=2)
    got = eedi3(shard_clip(clip, mesh), field=1, dh=True, vcheck=2)
    np.testing.assert_array_equal(np.asarray(got.planes[0]),
                                  np.asarray(want.planes[0]))
    spec = got.planes[0].sharding.spec
    assert len(spec) == 0 or spec[0] in ("frames", None)
