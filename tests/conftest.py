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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()


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
