"""Microbench the gather patterns that dominate the serving rollout.

xprof (round 2) attributes ~180 ms/rollout to gathers:
  * bilinear-sample row gathers bf16[180000,256] from (6*65536, 256) tile
    storage — 85 GiB/s measured (8x sublane amplification of the (8,128)
    tiling: each 512B row read costs a 4KB tile row);
  * 1D s32 index gathers in the splat binning (key[sidx], vals[gidx]) —
    0.3 GB/s (!) — XLA lowers flat-s32 gathers through scalar memory.

Each case below measures a candidate fix. Run on the TPU:
  python tools/gather_probe.py
"""

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
from jax import lax


def bench(fn, *args, reps=20, name=""):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:55s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    print("backend:", jax.default_backend())

    # ---- case A: feature-row gather (bilinear sampling taps) ----
    ROWS, C, NIDX = 6 * 65536, 256, 180000
    table_bf16 = jnp.asarray(rng.randn(ROWS, C).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, ROWS, NIDX).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
    bench(f, table_bf16, idx, name="A1 row-gather bf16 (180k x 256) random idx")
    bench(f, table_bf16, idx_sorted, name="A2 row-gather bf16 sorted idx")

    # one gather of 2-row slices (floor + floor+1 vertical taps fused):
    g2 = jax.jit(lambda t, i: lax.gather(
        t.reshape(ROWS // 256, 256, C),
        jnp.stack([i // 256, i % 256], -1)[:, None, :],
        lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, 2, C), mode="clip").sum(axis=(0, 1)))
    bench(g2, table_bf16, jnp.minimum(idx, ROWS - 2),
          name="A3 2-row-slice gather (vertical tap pair)")

    fp32_table = table_bf16.astype(jnp.float32)
    bench(f, fp32_table, idx, name="A4 row-gather f32 random idx")

    # A5/A6: is take descriptor-bound (row width ~free)? If A5 ~ A1, a
    # redundant 4C quad-row layout (one row = the 2x2 bilinear block)
    # replaces 4 tap gathers with ONE -> ~4x on the sampling bucket.
    table_2c = jnp.asarray(rng.randn(ROWS // 2, 2 * C).astype(np.float32)).astype(jnp.bfloat16)
    idx2 = jnp.asarray(rng.randint(0, ROWS // 2, NIDX).astype(np.int32))
    bench(f, table_2c, idx2, name="A5 row-gather bf16 (180k x 512) 2C rows")
    table_4c = jnp.asarray(rng.randn(ROWS // 4, 4 * C).astype(np.float32)).astype(jnp.bfloat16)
    idx4 = jnp.asarray(rng.randint(0, ROWS // 4, NIDX).astype(np.int32))
    bench(f, table_4c, idx4, name="A6 row-gather bf16 (180k x 1024) 4C rows")
    # A7: the quad-layout BUILD cost at serving scale (12 plane-frames of
    # (256,17,17,256) haloed tiles -> (256,16,16,1024) quad rows)
    th = jnp.asarray(rng.randn(12, 256, 17, 17, C).astype(np.float32)).astype(jnp.bfloat16)

    def build_quad(t):
        return jnp.concatenate(
            [t[:, :, :16, :16], t[:, :, :16, 1:17],
             t[:, :, 1:17, :16], t[:, :, 1:17, 1:17]], axis=-1)
    bench(jax.jit(lambda t: build_quad(t).sum()), th,
          name="A7 quad-layout build (12 x 256 tiles, 17^2 halo -> 4C)")

    # ---- case B: flat s32 gathers (splat binning) ----
    NPAIR, TK = 480000, 1024 * 512
    vals = jnp.asarray(rng.randint(0, 30000, NPAIR).astype(np.int32))
    gidx = jnp.asarray(rng.randint(0, NPAIR, TK).astype(np.int32))

    b1 = jax.jit(lambda v, i: jnp.take(v, i).sum())
    bench(b1, vals, gidx, name="B1 flat s32 gather 524k from 480k")

    # as rows of 128 lanes: widen values to (N, 1) -> does layout change help?
    b2 = jax.jit(lambda v, i: jnp.take(v[:, None], i, axis=0).sum())
    bench(b2, vals, gidx, name="B2 same but (N,1) 2D operand")

    # f32 payload instead of s32
    b3 = jax.jit(lambda v, i: jnp.take(v, i).sum())
    bench(b3, vals.astype(jnp.float32), gidx, name="B3 flat f32 gather")

    # gather contiguous K-runs via dynamic slices (starts per tile)
    T, K = 1024, 512
    starts = jnp.sort(jnp.asarray(rng.randint(0, NPAIR - K, T).astype(np.int32)))

    def seg_gather(v, s):
        def one(st):
            return lax.dynamic_slice(v, (st,), (K,))
        return jax.vmap(one)(s).sum()
    bench(jax.jit(seg_gather), vals.astype(jnp.float32), starts,
          name="B4 contiguous K-run dynamic-slice gather (T=1024)")

    # ---- case C: sort carrying values vs argsort+gathers ----
    keys = jnp.asarray(rng.randint(0, 2 ** 30, NPAIR).astype(np.int32))
    payload = [jnp.asarray(rng.randn(NPAIR).astype(np.float32))
               for _ in range(9)]

    def c1(k):
        sidx = jnp.argsort(k)
        return k[sidx].sum() + (sidx // 16).sum()
    bench(jax.jit(c1), keys, name="C1 argsort + key gather + //W2")

    def c2(k, pay):
        out = lax.sort((k,) + tuple(pay), num_keys=1)
        return sum(o.sum() for o in out)
    bench(jax.jit(c2), keys, payload, name="C2 sort carrying 9 f32 values")

    def c3(k, pay):
        g = jnp.arange(NPAIR, dtype=jnp.int32) // 16
        out = lax.sort((k, g), num_keys=1)
        return out[0].sum() + out[1].sum()
    bench(jax.jit(c3), keys, payload, name="C3 sort carrying 1 s32 value")

    # ---- case D: patch gather (upsampler sparse) ----
    H = W = 256 + 4
    CAP, P = 256, 20
    FP = 6
    planes = jnp.asarray(rng.randn(FP, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    r0 = jnp.asarray(rng.randint(0, H - P, (FP, CAP)).astype(np.int32))
    c0 = jnp.asarray(rng.randint(0, W - P, (FP, CAP)).astype(np.int32))

    def d1(x, r, c):  # current: full advanced-index gather
        def one(xx, rr, cc):
            rows = rr[:, None] + jnp.arange(P)
            cols = cc[:, None] + jnp.arange(P)
            return xx[rows[:, :, None], cols[:, None, :], :]
        return jax.vmap(one)(x, r, c).sum()
    bench(jax.jit(d1), planes, r0, c0, name="D1 patch gather advanced-index")

    def d2(x, r, c):  # row-segment gather: slice (1, P, C) per (tile,row)
        def one(xx, rr, cc):
            rows = (rr[:, None] + jnp.arange(P)).reshape(-1)     # (CAP*P,)
            cstart = jnp.repeat(cc, P)
            st = jnp.stack([rows, cstart], -1)
            out = lax.gather(
                xx, st[:, None, :],
                lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1)),
                slice_sizes=(1, P, C), mode="clip")
            return out
        return jax.vmap(one)(x, r, c).sum()
    bench(jax.jit(d2), planes, r0, c0, name="D2 patch gather row-segment slices")

    def d3(x, r, c):  # whole-patch gather: ONE (P, P, C) slice per tile
        def one(xx, rr, cc):
            st = jnp.stack([rr, cc], -1)                         # (CAP, 2)
            return lax.gather(
                xx, st,
                lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                    start_index_map=(0, 1)),
                slice_sizes=(P, P, C), mode="clip")
        return jax.vmap(one)(x, r, c).sum()
    bench(jax.jit(d3), planes, r0, c0, name="D3 patch gather whole-patch slices")

    def d4(x, r, c):  # row-PAIR segments: (2, P, C) slices, half the
        # descriptors of D2 (patch row starts are always even in the
        # sparse upsampler: tile_row * in_tile - halo with in_tile, halo even)
        def one(xx, rr, cc):
            rows = (rr[:, None] + 2 * jnp.arange(P // 2)).reshape(-1)
            cstart = jnp.repeat(cc, P // 2)
            st = jnp.stack([rows, cstart], -1)
            out = lax.gather(
                xx, st,
                lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                    start_index_map=(0, 1)),
                slice_sizes=(2, P, C), mode="clip")
            return out
        return jax.vmap(one)(x, r, c).sum()
    bench(jax.jit(d4), planes, r0, c0, name="D4 patch gather row-pair slices")


if __name__ == "__main__":
    main()
