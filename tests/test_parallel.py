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
