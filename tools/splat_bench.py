"""Standalone splat benchmark: old gather-packed path vs segment-DMA path.

12 frames x 30k gaussians -> 512^2, serving dims. Isolates the splat from
the full rollout so compile problems / wins are attributable.

Usage: python tools/splat_bench.py [--frames 12] [--n 30000] [--k 512]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--large", type=int, default=2048,
                    help="two-tier large-gaussian cap (segmented_2tier)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--paths", nargs="+",
                    default=["segmented", "frames_pallas"])
    a = ap.parse_args()
    H, W = a.size
    F, N = a.frames, a.n

    from audio_motion_avatar_tpu.ops import splat_pallas

    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.randn(F, N, 3) * 0.4).astype(np.float32))
    rot = rng.randn(F, N, 4).astype(np.float32)
    rot[..., 0] += 3.0
    rot = jnp.asarray(rot)
    s = jnp.asarray(rng.randn(F, N, 3).astype(np.float32) * 0.3)
    o = jnp.asarray(rng.randn(F, N).astype(np.float32))
    c = jnp.asarray(rng.rand(F, N, 3).astype(np.float32))
    K = jnp.asarray(np.tile(np.asarray(
        [[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]], np.float32),
        (F, 1, 1)))
    E = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    E[:, 2, 3] = 2.0 + 0.05 * np.arange(F)
    E = jnp.asarray(E)

    fns = {}
    if "segmented" in a.paths:
        fns["segmented"] = jax.jit(lambda *args: splat_pallas.
                                   render_frames_segmented(
                                       *args, W, H, max_per_tile=a.k,
                                       max_window=a.window))
    if "segmented_w2" in a.paths:
        # smaller candidate window: quarter-size binning sort; max_err vs
        # the first path quantifies the clipping error of W=2
        fns["segmented_w2"] = jax.jit(lambda *args: splat_pallas.
                                      render_frames_segmented(
                                          *args, W, H, max_per_tile=a.k,
                                          max_window=2))
    if "segmented_2tier" in a.paths:
        # two-tier binning: all gaussians 2x2 + top-`large` at full window;
        # max_err vs the first path quantifies the overflow clipping (0 when
        # <= `large` gaussians span >2 tiles)
        fns["segmented_2tier"] = jax.jit(lambda *args: splat_pallas.
                                         render_frames_segmented(
                                             *args, W, H, max_per_tile=a.k,
                                             max_window=a.window,
                                             large_cap=a.large))
    if "frames_pallas" in a.paths:
        fns["frames_pallas"] = jax.jit(lambda *args: splat_pallas.
                                       render_frames_pallas(
                                           *args, W, H, max_per_tile=a.k,
                                           max_window=a.window,
                                           batched_binning=False))

    args = (xyz, rot, s, o, c, K, E)
    out_ref = None
    for name, fn in fns.items():
        t0 = time.time()
        out = fn(*args)
        _ = float(out.mean())
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(a.reps):
            out = fn(*args)
            fence = float(out.mean())
        dt = (time.time() - t0) / a.reps * 1e3
        if out_ref is None:
            out_ref = np.asarray(out)
            err = 0.0
        else:
            err = float(np.abs(np.asarray(out) - out_ref).max())
        print(json.dumps({"path": name, "ms": round(dt, 2),
                          "ms_per_frame": round(dt / F, 3),
                          "compile_s": round(compile_s, 1),
                          "max_err_vs_first": err}), flush=True)


if __name__ == "__main__":
    main()
