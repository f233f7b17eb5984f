"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` per SURVEY.md §4's implication
(multi-host tests via multi-device CPU simulation).

NOTE: this image's sitecustomize imports jax and registers a TPU («axon»)
PJRT plugin before conftest runs, so env vars like JAX_PLATFORMS are
already baked — we must switch platforms via jax.config.update, which
works any time before first backend initialization.
"""

import os

TPU_TESTS = os.environ.get("ORBSLAM2_TPU_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_TESTS and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU smoke runs reuse the bench chip's persistent compile cache
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if TPU_TESTS:
        # only the tpu-marked smoke subset runs against the chip
        skip = pytest.mark.skip(reason="non-tpu test in TPU smoke mode")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
        return
    # fail fast if the platform override didn't take
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    skip_tpu = pytest.mark.skip(reason="TPU smoke test (ORBSLAM2_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
