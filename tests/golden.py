"""Golden-snapshot infrastructure (mirrors the reference's test strategy,
reference tests/golden.py, reimplemented for the Clip API).

Each test file declares `Case`s (format x geometry x filter kwargs); golden
per-plane stats live in tests/goldens/<filter>.json keyed by case id.
`pytest --update-goldens` regenerates; normal runs compare.  Goldens lock in
*current* behavior — review diffs after regeneration.

REFERENCE IMPORT: when a case id also exists in the reference's own golden
JSONs (/root/reference/tests/goldens/<filter>.json, same id scheme), the
REFERENCE value is the comparison target — never self-pinned, never updated
by --update-goldens.  This works because the fixture conversion is zimg-exact
(tests/zimg_exact.py), so the filters see the same input planes the reference
filters saw.  Case ids listed in REF_EXCLUDE fall back to self-pinned goldens
with a documented reason (float-path deviations where XLA arithmetic departs
from the reference's hand-SIMD Zig).  GoldenStore.ref_checked counts
reference-pinned comparisons for the session summary.
"""

from __future__ import annotations

import fnmatch
import json
import math
import os
from pathlib import Path

import numpy as np
import pytest

from vszip_tpu import Clip
from vszip_tpu.core.format import SampleType

GOLDENS_DIR = Path(__file__).resolve().parent / "goldens"
REF_GOLDENS_DIR = Path(
    os.environ.get("VSZIP_REF_GOLDENS", "/root/reference/tests/goldens")
)

# Case-id patterns (fnmatch, per filter) compared against SELF-pinned goldens
# instead of the reference values, each with a documented reason.  Keep this
# list short and justified: every entry is a known, measured deviation.
#
# EMPTY since round 5: the last entry (the XPSNR 10-bit upscale fixture at
# rel 3-10e-6) fell to the round-5 forensic (benchmarks/forensic_xpsnr10.py)
# — zimg stages integer-format resizes PER PLANE around the depth
# conversion: a plane that grows is depth-converted first and resized in
# the integer Q14 pixel path (the upscaled luma now matches at rel 1e-15),
# while a plane that shrinks is resized in float and quantized at the
# destination (the subsampled chroma matches at 3e-8).  See
# tests/zimg_exact.py convert_rgb24 / resize_plane_u16.
REF_EXCLUDE: dict[str, list[tuple[str, str]]] = {}


def ref_excluded(filter_name: str, key: str) -> str | None:
    for pat, reason in REF_EXCLUDE.get(filter_name, []):
        if fnmatch.fnmatch(key, pat):
            return reason
    return None


def _fmt_val(v) -> str:
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_fmt_val(x) for x in v) + "]"
    if isinstance(v, float):
        return format(v, "g")
    return str(v)


class Case:
    """One golden case: input format name + geometry + filter kwargs."""

    def __init__(self, fmt: str, geometry: str = "full", args: dict | None = None,
                 variant: str = ""):
        self.fmt = fmt
        self.geometry = geometry
        self.args = dict(args or {})
        self.variant = variant

    @property
    def id(self) -> str:
        argstr = ",".join(
            f"{k}={_fmt_val(v)}" for k, v in sorted(self.args.items())
        ) or "default"
        s = f"{self.fmt}|{self.geometry}|{argstr}"
        return f"{s}|{self.variant}" if self.variant else s

    def __str__(self):
        return self.id

    def __repr__(self):
        return f"Case({self.id})"


def grid(**axes) -> list[dict]:
    out = [{}]
    for key, values in axes.items():
        out = [{**d, key: v} for d in out for v in values]
    return out


def sweep(*, base_fmt: str, base_args: dict | None = None,
          base_geometry: str = "full", formats: tuple = (), args: tuple = (),
          geometries: tuple = (), variant: str = "") -> list[Case]:
    """One-axis-at-a-time sweep around a base config (not a cartesian
    product — reference tests/golden.py:74-103 rationale)."""
    base_args = dict(base_args or {})
    out, seen = [], set()

    def add(c: Case):
        if c.id not in seen:
            seen.add(c.id)
            out.append(c)

    for f in formats:
        add(Case(f, base_geometry, base_args, variant))
    for a in args:
        add(Case(base_fmt, base_geometry, {**base_args, **a}, variant))
    for g in geometries:
        add(Case(base_fmt, g, base_args, variant))
    return out


def plane_stats(clip: Clip, plane: int = 0, n: int = 0) -> dict:
    """PlaneStats-style stats: avg normalized to 0-1 for int formats
    (min/max stay raw), matching VS std.PlaneStats semantics the reference
    goldens use."""
    arr = np.asarray(clip.planes[plane][n])
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    mn, mx = float(arr.min()), float(arr.max())
    if clip.format.sample_type is SampleType.INTEGER:
        peak = (1 << clip.format.bits_per_sample) - 1
        avg = float(arr.astype(np.float64).mean() / peak)
        mn, mx = int(arr.min()), int(arr.max())
    else:
        avg = float(arr.astype(np.float64).mean())
    return {"avg": avg, "min": mn, "max": mx}


def golden_stats(clip: Clip, n: int = 0) -> dict:
    out = {}
    for p in range(clip.num_planes):
        st = plane_stats(clip, plane=p, n=n)
        for k, v in st.items():
            assert math.isfinite(v), f"plane {p} {k} not finite: {v}"
        assert st["min"] <= st["max"], f"plane {p}: min > max: {st}"
        out[f"p{p}"] = st
    return out


def _jsonable(value):
    if isinstance(value, dict):
        return {str(k): _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, bool) or value is None or isinstance(value, str):
        return value
    if isinstance(value, (int, np.integer)):
        return int(value)
    if isinstance(value, (float, np.floating)):
        assert math.isfinite(value), f"non-finite golden value: {value}"
        return float(value)
    raise TypeError(f"not golden-storable: {value!r}")


def _assert_close(expected, actual, rel, abs_, path):
    if isinstance(expected, dict):
        assert isinstance(actual, dict), f"{path}: type mismatch"
        assert set(expected) == set(actual), (
            f"{path}: keys {sorted(actual)} != {sorted(expected)}"
        )
        for k in expected:
            _assert_close(expected[k], actual[k], rel, abs_, f"{path}.{k}")
    elif isinstance(expected, list):
        assert len(expected) == len(actual), f"{path}: length mismatch"
        for i, (e, a) in enumerate(zip(expected, actual)):
            _assert_close(e, a, rel, abs_, f"{path}[{i}]")
    elif isinstance(expected, (int, float)) and not isinstance(expected, bool):
        assert actual == pytest.approx(expected, rel=rel, abs=abs_), (
            f"{path}: {actual!r} != golden {expected!r} (rel={rel}, abs={abs_})"
        )
    else:
        assert actual == expected, f"{path}: {actual!r} != golden {expected!r}"


class GoldenStore:
    def __init__(self, update: bool):
        self.update = update
        self._data: dict[str, dict] = {}
        self._ref: dict[str, dict] = {}
        self._dirty: set[str] = set()
        self.ref_checked = 0
        self.self_checked = 0

    def _file(self, name: str) -> Path:
        return GOLDENS_DIR / f"{name}.json"

    def _get(self, name: str) -> dict:
        if name not in self._data:
            f = self._file(name)
            self._data[name] = json.loads(f.read_text()) if f.is_file() else {}
        return self._data[name]

    def _get_ref(self, name: str) -> dict:
        if name not in self._ref:
            f = REF_GOLDENS_DIR / f"{name}.json"
            self._ref[name] = json.loads(f.read_text()) if f.is_file() else {}
        return self._ref[name]

    def check_value(self, filter_name: str, key, value, rel: float = 1e-6,
                    abs_: float = 1e-9) -> None:
        key = str(key)
        value = _jsonable(value)
        ref = self._get_ref(filter_name)
        if key in ref and ref_excluded(filter_name, key) is None:
            # reference-pinned: the reference repo's own golden value is the
            # target, regardless of --update-goldens.
            self.ref_checked += 1
            _assert_close(ref[key], value, rel, abs_,
                          f"{filter_name}[{key}] (REFERENCE-pinned)")
            return
        self.self_checked += 1
        data = self._get(filter_name)
        if self.update:
            data[key] = value
            self._dirty.add(filter_name)
            return
        if key not in data:
            pytest.fail(
                f"no golden for {filter_name}[{key}]; run `pytest --update-goldens`"
            )
        _assert_close(data[key], value, rel, abs_, f"{filter_name}[{key}]")

    def check(self, filter_name: str, case: Case, clip: Clip, n: int = 0,
              rel: float | None = None) -> None:
        if rel is None:
            rel = 1e-6
        self.check_value(filter_name, case, golden_stats(clip, n), rel=rel)

    def save(self) -> None:
        if not self._dirty:
            return
        GOLDENS_DIR.mkdir(exist_ok=True)
        for name in sorted(self._dirty):
            data = {k: self._data[name][k] for k in sorted(self._data[name])}
            self._file(name).write_text(json.dumps(data, indent=1) + "\n")
