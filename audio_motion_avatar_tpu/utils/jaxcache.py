"""Persistent-compile-cache activation that actually works on this image.

The image's sitecustomize imports jax (registering the axon TPU plugin)
BEFORE any user code, so `os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
...)` at the top of a script is too late — jax bound its config defaults at
import. Every tool that relied on the env-var pattern recompiled everything
through the slow remote-compile tunnel (~30s-5min per HLO); bench.py's
327.8 s "cold" compile in BENCH_r04 was exactly this. Setting the config
explicitly still works any time before first backend use.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default: repo
    .jax_cache or $JAX_COMPILATION_CACHE_DIR) via jax.config.update, which
    works even when the env var was set after jax import. Returns the path."""
    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1s — keep everything above it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # very old jax without these names
        pass
    return path
