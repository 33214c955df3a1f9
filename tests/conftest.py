"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior is validated the TPU-native way — XLA's host platform
with forced device count — since no multi-chip hardware is attached
(SURVEY.md §4 implication (4)).

Note: this image's sitecustomize imports jax and registers the axon TPU
plugin before conftest runs, so plain env vars are too late; we override via
jax.config (legal until the first backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the CPU test compiles: this image is a
# 1-core box where XLA compiles dominate test wall time; a warmed
# .jax_cache_tests makes re-runs (the pre-commit case) fast.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
    config.addinivalue_line(
        "markers", "quick: fast unit tests (pre-commit tier; measured 114 s cold / 93 s warm .jax_cache_tests on this 1-core image, 2026-08-19)")
    config.addinivalue_line(
        "markers", "slow: compile-heavy integration tests (excluded from quick)")


# Modules whose every test is fast (pure-math / host-side units). The heavy
# integration tiers (splat render, stage train steps, PTv3, end-to-end) stay
# out so `-m quick` serves as a pre-commit gate.
QUICK_MODULES = {
    "test_cameras", "test_rotations", "test_sh", "test_serialization",
    "test_config", "test_losses", "test_mesh_utils", "test_smplx",
    "test_triplane", "test_checkpoints", "test_torch_import",
    "test_utils_graphics", "test_prefetch", "test_audio_encoder",
    "test_import_upsampler", "test_parity_check",
    "test_sapiens_convert", "test_bench_chain",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.get_closest_marker("slow") is not None:
            continue  # explicit slow beats module-level quick
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_sessionstart(session):
    """Build the native prefetch ring if absent (tests exercise it)."""
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libamatprefetch.so")
    if not os.path.exists(so):
        subprocess.run(["sh", os.path.join(root, "native", "build.sh")],
                       check=False, capture_output=True)
