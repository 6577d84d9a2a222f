"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(vszip_tpu.parallel) is exercised without TPU hardware; bench.py runs the
same ops on the real chip.  Must set flags before JAX initializes.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# Env vars alone are overridden by out-of-tree platform plugins (e.g. the
# axon TPU relay registers itself regardless of JAX_PLATFORMS), so force the
# platform through jax.config before any backend initializes.  This is what
# guarantees the suite really runs on the 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    n = len(jax.devices())
    if n < 8 or jax.devices()[0].platform != "cpu":
        raise RuntimeError(
            f"test suite requires the 8-virtual-device CPU mesh, got "
            f"{n} {jax.devices()[0].platform} device(s); check XLA_FLAGS "
            f"and jax_platforms forcing in conftest.py"
        )

sys.path.insert(0, str(Path(__file__).resolve().parent))

from golden import GoldenStore  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--update-goldens",
        action="store_true",
        default=False,
        help="regenerate tests/goldens/*.json from the current build",
    )


def pytest_configure(config):
    config._golden_store = GoldenStore(config.getoption("--update-goldens"))


def pytest_sessionfinish(session, exitstatus):
    store = getattr(session.config, "_golden_store", None)
    if store is not None:
        store.save()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    store = getattr(config, "_golden_store", None)
    if store is not None and (store.ref_checked or store.self_checked):
        terminalreporter.write_line(
            f"goldens: {store.ref_checked} REFERENCE-pinned comparisons, "
            f"{store.self_checked} self-pinned"
        )


@pytest.fixture(scope="session")
def golden(request):
    return request.config._golden_store


@pytest.fixture(scope="session")
def src_rgb():
    """Single-frame 640x320 RGB24 procedural test image."""
    from fixtures import source_rgb24

    return source_rgb24()


@pytest.fixture(scope="session")
def make_clip(src_rgb):
    """Factory: the source image in any format/geometry, cached per session."""
    from fixtures import convert, geometry_variant

    cache = {}

    def make(fmt_name: str, geometry: str = "full"):
        key = (fmt_name, geometry)
        if key not in cache:
            cache[key] = geometry_variant(convert(src_rgb, fmt_name), geometry)
        return cache[key]

    return make


@pytest.fixture(scope="session")
def make_temporal_clip():
    """Factory: 3-frame vertically-shifted clip for temporal filters.
    Converted with Point resize like the reference (tests/conftest.py:161):
    Point preserves the dot-crawl-like detail temporal filters react to."""
    from fixtures import convert, geometry_variant, temporal_rgb24

    cache = {}
    base = temporal_rgb24()

    def make(fmt_name: str, geometry: str = "full"):
        key = (fmt_name, geometry)
        if key not in cache:
            cache[key] = geometry_variant(convert(base, fmt_name, "point"), geometry)
        return cache[key]

    return make
