"""Multi-host (multi-process) runtime initialization.

The reference's multi-device entry is Lightning DDP spawning one process
per GPU with NCCL rendezvous (reference: src/utils/trainer_factory.py:29-46,
README.md:274-279 NCCL env tuning). The TPU-native equivalent is ONE
process per host with `jax.distributed.initialize()`: after it,
`jax.devices()` spans every chip in the slice/pod and the same
mesh/pjit/collectives program runs over ICI (and DCN across slices) with no
further code changes — mesh.make_mesh already builds from the global device
list.

Call `maybe_initialize()` first thing in the CLIs. It is a no-op unless the
run is actually multi-process, detected from either:
  * standard TPU pod metadata (jax.distributed.initialize() with no args
    auto-discovers coordinator/process_index on Cloud TPU), requested via
    cfg.training.multihost: true or AMA_MULTIHOST=1;
  * explicit env rendezvous: JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES,
    JAX_PROCESS_ID] — the manual path for CPU/GPU fleets.
"""

from __future__ import annotations

import os

_initialized = False


def apply_platform_env() -> None:
    """Honor AMA_PLATFORM=cpu|tpu from the CLIs. This image's sitecustomize
    imports jax (registering the TPU plugin) before user code runs, so the
    JAX_PLATFORMS env var alone is too late; jax.config.update still works
    until the first backend initialization."""
    plat = os.environ.get("AMA_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    # Persistent compile cache by default: the serving rollout's COLD
    # compile is ~5 min on one v5e (BASELINE.md cold/warm row); a warm
    # cache restores it in seconds. Users can point this elsewhere or
    # pre-populate it (`--prewarm`, docs/SERVING.md).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "audio_motion_avatar_tpu", "jax_cache")
        os.makedirs(cache, exist_ok=True)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass


def maybe_initialize(cfg=None) -> bool:
    """Initialize the JAX distributed runtime if this looks like a
    multi-process run. Returns True iff initialize() was called (idempotent:
    repeat calls return the first outcome)."""
    global _initialized
    if _initialized:
        return True

    want = os.environ.get("AMA_MULTIHOST", "") not in ("", "0", "false")
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if cfg is not None:
        try:
            want = want or bool(cfg.training.get("multihost", False))
        except Exception:  # noqa: BLE001 — cfg without a training section
            pass
    if not (want or coord):
        return False

    import jax
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    else:
        jax.distributed.initialize()  # Cloud TPU metadata auto-discovery
    _initialized = True
    print(f"[distributed] initialized: process {jax.process_index()}"
          f"/{jax.process_count()}, {len(jax.devices())} global devices")
    return True
