"""Benchmark: differentiable Gaussian splat rendering on one TPU chip.

Measures the framework's centerpiece kernel at the north-star operating
point (BASELINE.md: >= 25 fps end-to-end audio -> 512x512 avatar on one
v5e): 30,000 Gaussians rasterized to 512x512 through projection + sorted
tile binning + the Pallas compositing kernel.

Methodology: 20 frames rendered inside ONE compiled program (lax.fori_loop,
perturbing positions per frame so nothing folds away) — matching how the
pipeline actually runs (stage 2 renders whole 6-frame rollouts per
dispatch) and excluding this environment's fixed per-dispatch relay
overhead (~30 ms, measured).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline = fps / 25 (driver-set north star; the reference publishes no
numbers — BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

FRAMES = 20


def main():
    from audio_motion_avatar_tpu.ops import splat, splat_pallas
    from audio_motion_avatar_tpu.ops.cameras import make_camera

    N, W, H = 30000, 512, 512
    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.randn(N, 3) * np.array([0.25, 0.6, 0.15])).astype(np.float32))
    rot = rng.randn(N, 4).astype(np.float32)
    rot[:, 0] += 3.0
    rot = jnp.asarray(rot)
    raw_s = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.3)
    raw_o = jnp.asarray(rng.randn(N).astype(np.float32))
    col = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    E = jnp.eye(4).at[2, 3].set(2.5)
    cam = make_camera(K, E, W, H)

    @jax.jit
    def render_frames(xyz, raw_s, raw_o, col):
        def body(i, acc):
            proj = splat.project_gaussians(
                xyz + 1e-4 * i, rot, splat.activate_scales(raw_s),
                splat.activate_opacity(raw_o), col, cam)
            img = splat_pallas.render_tiles_pallas(
                proj, W, H, max_per_tile=256, max_window=4)
            return acc + img.mean()

        return jax.lax.fori_loop(0, FRAMES, body, 0.0)

    # NOTE: on this environment block_until_ready does not reliably block
    # (async relay); converting the scalar result to a python float forces a
    # real device->host sync, so every rep is fenced by float().
    float(render_frames(xyz, raw_s, raw_o, col))  # compile + sync
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        float(render_frames(xyz, raw_s, raw_o, col))
    dt = (time.time() - t0) / (reps * FRAMES)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "splat_render_30k_gaussians_512px",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 25.0, 3),
    }))


if __name__ == "__main__":
    main()
