"""Roofline table for the triplane upsampler at serving dims (VERDICT r2 #5).

For each upsampler level (and the whole module, dense + sparse-final), this
jits the level at the serving batch, pulls XLA's own cost analysis (flops,
bytes accessed) from the compiled executable, measures fenced time, and
prints the roofline verdict per level:

    time_floor = max(flops / MXU_peak, bytes / HBM_peak)
    attainment = time_floor / measured

v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM. The table is the
"roofline proof it's at its floor" artifact for the upsampler <=150 ms
item — per-level attainment shows which levels are compute-floored and
which still have headroom.

One JSON line per row; finish with a markdown table on stderr for
BASELINE.md. Serving batch = 18 planes (6 frames x 3), bf16 NHWC,
affine norm (released-ckpt parity config).
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

MXU_PEAK = 197e12   # bf16 FLOP/s, v5e
HBM_PEAK = 819e9    # B/s, v5e


def measure(fn, args, iters):
    """Fenced ms/iter of fn(*args) with EVERY array input perturbed by an
    i-dependent offset inside the loop — otherwise XLA hoists work that
    depends only on a loop-invariant arg (e.g. the sparse row's uv clipping
    + select_tiles + tile-id sort) out of the timed fori_loop, understating
    per-iteration time vs serving, where points change every frame."""
    @jax.jit
    def loop(*args):
        def body(i, acc):
            eps = (1e-6 * i)
            perturbed = tuple(x + eps.astype(x.dtype) for x in args)
            out = fn(*perturbed)
            return acc + out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(*args))          # compile + warm
    t0 = time.time()
    float(loop(*args))
    return (time.time() - t0) / iters * 1000.0


def cost(fn, args):
    """XLA-counted (flops, bytes) for one application of fn."""
    an = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(an, (list, tuple)):
        an = an[0]
    return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))


def row(name, ms, flops, byts):
    t_mxu = flops / MXU_PEAK * 1e3
    t_hbm = byts / HBM_PEAK * 1e3
    floor = max(t_mxu, t_hbm)
    bound = "compute" if t_mxu >= t_hbm else "memory"
    r = {"level": name, "ms": round(ms, 2),
         "gflop": round(flops / 1e9, 1), "gbytes": round(byts / 1e9, 2),
         "floor_ms": round(floor, 2), "bound": bound,
         "attainment_pct": round(100.0 * floor / ms, 1) if ms else 0.0,
         "mxu_pct": round(100.0 * t_mxu / ms, 1) if ms else 0.0,
         "hbm_pct": round(100.0 * t_hbm / ms, 1) if ms else 0.0}
    print(json.dumps(r), flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--planes", type=int, default=18,
                    help="serving batch: frames x 3 planes (must be "
                         "divisible by 3 so every row benches the same "
                         "batch)")
    ap.add_argument("--cap", type=int, default=256)
    a = ap.parse_args()
    if a.planes % 3 != 0:
        ap.error(f"--planes must be divisible by 3 (got {a.planes}); "
                 "otherwise the full-module rows would silently bench a "
                 "different batch than the per-level rows")

    from audio_motion_avatar_tpu.models.upsampler import (
        TriplaneUpsampler, UpsampleBlock)
    from audio_motion_avatar_tpu.ops.triplane import (
        sample_triplane_sparse, PLANE_AXES)

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    rows = []

    # --- per dense level: UpsampleBlock + the skip path. The module's skip
    # is a skip_proj 1x1 conv of the input at level 0, then a nearest-2x of
    # a running buffer at deeper levels (upsampler.py); the up_0 row
    # includes that 1x1 conv in BOTH measure and cost, deeper rows
    # approximate the running buffer with a nearest-2x of the input
    # (same shape/traffic, no extra FLOPs). ---
    import flax.linen as nn
    for i, res in enumerate((32, 64, 128)):
        x = jnp.asarray(rng.randn(a.planes, res, res, 256)
                        .astype(np.float32)).astype(dt)
        blk = UpsampleBlock(256, dtype=dt, upconv="dilated",
                            norm_mode="affine")
        v = blk.init(jax.random.PRNGKey(i), x[:1])
        proj = nn.Conv(256, (1, 1), dtype=dt)
        vp = proj.init(jax.random.PRNGKey(100 + i), x[:1]) if i == 0 else None

        def level(xx, v=v, blk=blk, vp=vp):
            up = blk.apply(v, xx)
            s = proj.apply(vp, xx) if vp is not None else xx
            skip = jnp.repeat(jnp.repeat(s, 2, 1), 2, 2)
            return up + skip

        ms = measure(level, (x,), a.iters)
        fl, by = cost(level, (x,))
        rows.append(row(f"up_{i} ({res}->{res*2}) dense", ms, fl, by))

    # --- full module, sparse final level at the serving cap, affine ---
    planes = jnp.asarray(rng.randn(a.planes // 3 if a.planes % 3 == 0 else 6,
                                   3, 256, 32, 32)
                         .astype(np.float32)).astype(dt)
    B = planes.shape[0]
    ups = TriplaneUpsampler(256, 4, dtype=dt, channels_last=True,
                            sparse_final=True, sparse_max_tiles=a.cap,
                            upconv="dilated", norm_mode="affine")
    pts = jnp.asarray(
        (rng.rand(B, 30720, 3).astype(np.float32) * 0.5 - 0.25))
    uv = jnp.stack([pts[..., (a0, a1)] for a0, a1 in PLANE_AXES], axis=1)
    v = ups.init(jax.random.PRNGKey(9), planes[:1], uv[:1])

    def full(p, u):
        sp = ups.apply(v, p, u)
        # fence through a sparse sample so the scatter isn't dead code
        out = sample_triplane_sparse(sp, pts, 1.0)
        return out.astype(jnp.float32)

    ms = measure(full, (planes, uv), max(2, a.iters // 2))
    fl, by = cost(full, (planes, uv))
    rows.append(row(f"full sparse(cap {a.cap}) + sample", ms, fl, by))

    # dense-final twin for the floor comparison
    ups_d = TriplaneUpsampler(256, 4, dtype=dt, channels_last=True,
                              upconv="dilated", norm_mode="affine")
    vd = ups_d.init(jax.random.PRNGKey(9), planes[:1])
    ms = measure(lambda p: ups_d.apply(vd, p).astype(jnp.float32),
                 (planes,), max(2, a.iters // 2))
    fl, by = cost(lambda p: ups_d.apply(vd, p), (planes,))
    rows.append(row("full dense", ms, fl, by))

    print("\n| level | ms | GFLOP | GB | floor ms | bound | attainment |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['level']} | {r['ms']} | {r['gflop']} | {r['gbytes']} | "
              f"{r['floor_ms']} | {r['bound']} | {r['attainment_pct']}% |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
