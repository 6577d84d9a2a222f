"""Streaming-runtime tests: chunked double-buffered execution must be
indistinguishable from one resident batch (planes bit-exact, per-frame
props identical), including temporal ops fed boundary halos.

The reference's host runtime streams frames with prefetch + cache
(SURVEY §2.3); process_stream is the TPU-native equivalent
(vszip_tpu/runtime/stream.py)."""

import numpy as np
import pytest

from vszip_tpu import (
    ArraySource,
    Clip,
    SyntheticSource,
    VSZipError,
    get_format,
    process_stream,
)
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.checkmate import checkmate
from vszip_tpu.ops.planeaverage import plane_average


def _planes(n=13, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 65536, (n, h, w), dtype=np.uint16),
        rng.integers(0, 65536, (n, h // 2, w // 2), dtype=np.uint16),
        rng.integers(0, 65536, (n, h // 2, w // 2), dtype=np.uint16),
    )


@pytest.fixture()
def src():
    return ArraySource(_planes(), get_format("YUV420P16"))


def _collect(fmt):
    chunks = {}

    def sink(start, clip):
        chunks[start] = clip

    def assemble():
        planes = []
        for p in range(fmt.num_planes):
            planes.append(np.concatenate(
                [chunks[s].planes[p] for s in sorted(chunks)]))
        return planes

    return sink, assemble


def test_spatial_op_matches_resident(src):
    resident = boxblur(
        Clip.from_planes(src.planes, src.format), hradius=3, vradius=2)
    sink, assemble = _collect(src.format)
    process_stream(src, lambda c: boxblur(c, hradius=3, vradius=2),
                   batch=4, sink=sink)
    for got, want in zip(assemble(), resident.planes):
        np.testing.assert_array_equal(got, np.asarray(want))


def test_temporal_op_overlap_matches_resident():
    planes = tuple(
        (p >> 8).astype(np.uint8) for p in _planes())
    src = ArraySource(planes, get_format("YUV420P8"))
    resident = checkmate(
        Clip.from_planes(src.planes, src.format), thr=12, tmax=12, tthr2=8)
    sink, assemble = _collect(src.format)
    process_stream(src, lambda c: checkmate(c, thr=12, tmax=12, tthr2=8),
                   batch=4, overlap=2, sink=sink)
    for got, want in zip(assemble(), resident.planes):
        np.testing.assert_array_equal(got, np.asarray(want))


def test_metric_props_accumulate(src):
    resident = plane_average(
        Clip.from_planes(src.planes, src.format), exclude=[-1])
    props = process_stream(src, lambda c: plane_average(c, exclude=[-1]),
                           batch=5)
    np.testing.assert_allclose(
        props["psmAvg"],
        np.asarray(resident.props["psmAvg"]),
        rtol=0, atol=0)


def test_synthetic_source_never_materializes():
    fmt = get_format("GRAY16")
    calls = []

    def make(start, stop):
        calls.append((start, stop))
        rng = np.random.default_rng(start)
        return (rng.integers(0, 65536, (stop - start, 32, 48), np.uint16),)

    source = SyntheticSource(make, fmt, num_frames=11)
    props = process_stream(source, lambda c: plane_average(c, exclude=[-1]),
                           batch=4)
    assert props["psmAvg"].shape == (11, 1)
    assert calls == [(0, 4), (4, 8), (8, 11)]


def test_errors(src):
    with pytest.raises(VSZipError, match="batch"):
        process_stream(src, lambda c: c, batch=0)
    empty = ArraySource((np.zeros((0, 8, 8), np.uint16),), get_format("GRAY16"))
    with pytest.raises(VSZipError, match="empty"):
        process_stream(empty, lambda c: c)
