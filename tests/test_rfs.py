"""RFS + PackRGB tests."""

import numpy as np
import pytest

from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.packrgb import packrgb
from vszip_tpu.ops.rfs import rfs


def test_rfs_replace(make_temporal_clip):
    a = make_temporal_clip("YUV420P8")
    b = boxblur(a, hradius=2, vradius=2)
    out = rfs(a, b, frames=[1])
    for p in range(3):
        np.testing.assert_array_equal(np.asarray(out.planes[p][0]), np.asarray(a.planes[p][0]))
        np.testing.assert_array_equal(np.asarray(out.planes[p][1]), np.asarray(b.planes[p][1]))
        np.testing.assert_array_equal(np.asarray(out.planes[p][2]), np.asarray(a.planes[p][2]))


def test_rfs_plane_subset(make_temporal_clip):
    a = make_temporal_clip("YUV420P8")
    b = boxblur(a, hradius=2, vradius=2)
    out = rfs(a, b, frames=[0, 2], planes=[0])
    np.testing.assert_array_equal(np.asarray(out.planes[0][0]), np.asarray(b.planes[0][0]))
    np.testing.assert_array_equal(np.asarray(out.planes[1][0]), np.asarray(a.planes[1][0]))
    np.testing.assert_array_equal(np.asarray(out.planes[0][1]), np.asarray(a.planes[0][1]))


def test_rfs_no_frames_passthrough(make_temporal_clip):
    a = make_temporal_clip("GRAY8")
    b = boxblur(a, hradius=1, vradius=1)
    out = rfs(a, b)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(a.planes[0]))


def test_rfs_errors(make_temporal_clip, make_clip):
    a = make_temporal_clip("GRAY8")
    b = boxblur(a, hradius=1, vradius=1)
    with pytest.raises(VSZipError, match="must be non-negative"):
        rfs(a, b, frames=[-1])
    with pytest.raises(VSZipError, match="last frame index"):
        rfs(a, b, frames=[99])
    with pytest.raises(VSZipError, match="formats don't match"):
        rfs(a, make_temporal_clip("GRAY16"))


def test_rfs_mismatch_format(make_temporal_clip):
    """mismatch=True serves frames wholesale from either source and wipes
    the diverging clip-level info (reference src/vapoursynth/rfs.zig:150-188)."""
    from vszip_tpu import VariableClip

    a = make_temporal_clip("GRAY8")
    b = make_temporal_clip("GRAY16")
    out = rfs(a, b, frames=[1], mismatch=True)
    assert isinstance(out, VariableClip)
    assert out.num_frames == 3
    assert not out.format  # formats diverge -> wiped (falsy sentinel)
    assert out.width == a.width and out.height == a.height  # dims agree
    f0, f1 = out.get_frame(0), out.get_frame(1)
    assert f0.format.name == "GRAY8" and f1.format.name == "GRAY16"
    np.testing.assert_array_equal(np.asarray(f0.planes[0]), np.asarray(a.planes[0][:1]))
    np.testing.assert_array_equal(np.asarray(f1.planes[0]), np.asarray(b.planes[0][1:2]))


def test_rfs_mismatch_dims(make_temporal_clip):
    from fixtures import crop_abs
    from vszip_tpu import VariableClip

    a = make_temporal_clip("GRAY8")
    b = crop_abs(a, 64, 64)
    out = rfs(a, b, frames=[0], mismatch=True)
    assert isinstance(out, VariableClip)
    assert out.width == 0 and out.height == 0  # dims diverge -> wiped
    assert out.format.name == "GRAY8"  # formats agree -> kept
    assert out.get_frame(0).width == 64
    assert out.get_frame(1).width == a.width


def test_rfs_mismatch_same_format_stays_dense(make_temporal_clip):
    """When nothing actually diverges, mismatch=True output is a normal clip
    (the reference only wipes fields that differ)."""
    a = make_temporal_clip("GRAY8")
    b = boxblur(a, hradius=1, vradius=1)
    out = rfs(a, b, frames=[2], mismatch=True)
    np.testing.assert_array_equal(np.asarray(out.planes[0][2]), np.asarray(b.planes[0][2]))
    np.testing.assert_array_equal(np.asarray(out.planes[0][0]), np.asarray(a.planes[0][0]))


def test_rfs_mismatch_output_rejected_by_filters(make_temporal_clip):
    """Piping a variable-format clip into any filter raises the host
    runtime's clear constant-format error, not an opaque AttributeError
    (every op consumes clips through .planes/.props)."""
    a = make_temporal_clip("GRAY8")
    b = make_temporal_clip("GRAY16")
    out = rfs(a, b, frames=[1], mismatch=True)
    with pytest.raises(VSZipError, match="constant format and dimensions"):
        boxblur(out, hradius=1, vradius=1)
    from vszip_tpu.ops.limiter import limiter

    with pytest.raises(VSZipError, match="constant format and dimensions"):
        limiter(out, tv_range=True)


def test_rfs_mismatch_planes_subset_rejected(make_temporal_clip):
    a = make_temporal_clip("YUV420P8")
    b = make_temporal_clip("YUV420P16")
    with pytest.raises(VSZipError, match="planes subset requires"):
        rfs(a, b, frames=[0], planes=[0], mismatch=True)


def test_packrgb_rgb24(make_clip):
    clip = make_clip("RGB24")
    out = packrgb(clip)
    assert out.format.name == "GRAY32"
    packed = np.asarray(out.planes[0][0])
    r, g, b = (np.asarray(p[0]).astype(np.uint32) for p in clip.planes)
    ref = b | (g << 8) | (r << 16) | np.uint32(0xFF000000)
    np.testing.assert_array_equal(packed, ref)
    # byte view is B,G,R,A
    by = packed.view(np.uint8).reshape(*packed.shape, 4)
    np.testing.assert_array_equal(by[..., 3], 255)
    np.testing.assert_array_equal(by[..., 2], r.astype(np.uint8))


def test_packrgb_rgb30(make_clip):
    clip = make_clip("RGB30")
    out = packrgb(clip)
    packed = np.asarray(out.planes[0][0])
    r, g, b = (np.asarray(p[0]).astype(np.uint32) for p in clip.planes)
    ref = b | (g << 10) | (r << 20) | np.uint32(0b11 << 30)
    np.testing.assert_array_equal(packed, ref)


def test_packrgb_errors(make_clip):
    with pytest.raises(VSZipError, match="only RGB24 and RGB30"):
        packrgb(make_clip("RGB48"))
    with pytest.raises(VSZipError, match="only RGB24 and RGB30"):
        packrgb(make_clip("GRAY8"))
