"""Probe: PTv3 point-refiner cost decomposition at serving shape.

Times the PointRefiner standalone at (F=12, N=30000, C=768->256) bf16 and
ablates: the serialization sorts (identity orders), the xCPE conv, the
attention masks. One jit per variant (fori_loop, fenced)."""

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


def timeit(fn, args, iters):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            out = fn(args[0] + 1e-6 * i, *args[1:])
            return acc + out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    return (time.time() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()

    import dataclasses
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner

    cfg = dataclasses.replace(AvatarConfig(), compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(a.frames, a.points, 3).astype(np.float32) * 0.5)
    feats = jnp.asarray(rng.randn(a.frames, a.points, 768).astype(np.float32))

    refiner = build_point_refiner(cfg)
    v = refiner.init(jax.random.PRNGKey(0), pts[:1], feats[:1])

    ms = timeit(lambda p, f: refiner.apply(v, p, f), (pts, feats), a.iters)
    print(json.dumps({"variant": "refiner_full", "ms": round(ms, 2),
                      "ms_per_frame": round(ms / a.frames, 2)}), flush=True)

    # sorts only: the 4 stage-0 order constructions
    from audio_motion_avatar_tpu.ops import serialization as ser
    from audio_motion_avatar_tpu.models.ptv3 import invert_perm

    def sorts_only(p, f):
        grid = ser.grid_coords(p.reshape(-1, 3)[:30720], 100.0)
        acc = 0.0
        for o in ser.ORDERS:
            code = ser.encode(grid, o)
            perm = jnp.argsort(code)
            acc = acc + invert_perm(perm).sum().astype(jnp.float32)
        return acc[None]

    def sorts_batched(p, f):
        def one(pp):
            grid = ser.grid_coords(pp, 100.0)
            acc = 0.0
            for o in ser.ORDERS:
                code = ser.encode(grid, o)
                perm = jnp.argsort(code)
                acc = acc + invert_perm(perm).sum().astype(jnp.float32)
            return acc
        return jax.vmap(one)(p)

    ms = timeit(sorts_batched, (pts, feats), a.iters)
    print(json.dumps({"variant": "stage0_sorts_12frames", "ms": round(ms, 2)}),
          flush=True)

    # dec0 MLP isolation: xprof_affine shows mlp2 ((N,1024)@(1024,256)) at
    # 6.16 ms/rollout vs the identical-FLOP mlp1 at 1.31 — hypothesis: the
    # exact-erf GELU fuses into the dot as an operand and stalls the MXU
    # pipeline on VPU transcendentals. Variants isolate that.
    N = a.frames * 30720
    x = jnp.asarray(rng.randn(N, 256).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(256, 1024).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(1024, 256).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)

    def mlp(act, barrier, xx, _):
        h = xx @ w1
        h = act(h)
        if barrier:
            (h,) = jax.lax.optimization_barrier((h,))
        return h @ w2

    import functools
    for name, act, barrier in (
            ("mlp_gelu_erf", functools.partial(jax.nn.gelu, approximate=False), False),
            ("mlp_gelu_erf_barrier", functools.partial(jax.nn.gelu, approximate=False), True),
            ("mlp_gelu_tanh", functools.partial(jax.nn.gelu, approximate=True), False),
            ("mlp_relu", jax.nn.relu, False),
            ("mlp_identity", (lambda t: t), False)):
        ms = timeit(functools.partial(mlp, act, barrier), (x, feats), a.iters)
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
