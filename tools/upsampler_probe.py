"""Probe: triplane upsampler cost decomposition on the real chip.

The upsampler (32->512, 4 UpsampleBlocks) is the largest serving component.
This times, at the serving batch (18 = 6 frames x 3 planes, bf16, NHWC):

  * full          — the real TriplaneUpsampler
  * noskip        — without the nearest-2x skip accumulation
  * nonorm        — ResBlocks with GroupNorm replaced by identity
  * convs_only    — the bare conv stack (upconv + 2 resconvs per level)
  * upconv_naive  — nearest2x materialized + SAME conv3x3 (reference form)
  * upconv_poly   — the fused polyphase form (the shipped one)
  * batch scaling — full at batch 3 / 9 / 18 / 36

All inside one jit per variant (fori_loop x ITERS, input perturbed,
float()-fenced). Prints one JSON line per variant.
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
import flax.linen as nn


def timeit(fn, x, iters):
    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + fn(x + 1e-6 * i).mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(x))
    t0 = time.time()
    float(loop(x))
    return (time.time() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=4)
    a = ap.parse_args()

    from audio_motion_avatar_tpu.models.upsampler import (
        TriplaneUpsampler, UpsampleBlock, ResBlock, _nearest2x,
        _upsample2x_conv3x3)

    rng = np.random.RandomState(0)
    C, R = a.dim, a.res

    def planes(batch):
        return jnp.asarray(rng.randn(batch // 3, 3, C, R, R), jnp.float32)

    x18 = planes(18)

    def run_module(mod, x):
        v = mod.init(jax.random.PRNGKey(0), x)
        return timeit(lambda y: mod.apply(v, y), x, a.iters)

    results = {}

    for b in (3, 9, 18, 36):
        mod = TriplaneUpsampler(C, a.blocks, dtype=jnp.bfloat16,
                                channels_last=True)
        ms = run_module(mod, planes(b))
        results[f"full_b{b}"] = ms
        print(json.dumps({"variant": f"full_b{b}", "ms": round(ms, 2),
                          "ms_per_frame": round(ms / (b / 3), 2)}), flush=True)

    # --- norm / skip ablations via custom modules ---
    class NoNormUpsampler(nn.Module):
        @nn.compact
        def __call__(self, p):
            B, P, Cc, H, W = p.shape
            x = p.reshape(B * P, Cc, H, W).transpose(0, 2, 3, 1).astype(jnp.bfloat16)
            for i in range(a.blocks):
                w = self.param(f"w{i}", nn.initializers.lecun_normal(),
                               (3, 3, Cc, C))
                bb = self.param(f"b{i}", nn.initializers.zeros, (C,))
                h = _upsample2x_conv3x3(x, w, bb, dtype=jnp.bfloat16)
                h = nn.relu(h)
                h = nn.Conv(C, (3, 3), padding=1, dtype=jnp.bfloat16,
                            name=f"c1_{i}")(h)
                h = nn.relu(h)
                x = h + nn.Conv(C, (3, 3), padding=1, dtype=jnp.bfloat16,
                                name=f"c2_{i}")(h)
            return x

    ms = run_module(NoNormUpsampler(), x18)
    results["nonorm_b18"] = ms
    print(json.dumps({"variant": "nonorm_b18", "ms": round(ms, 2)}), flush=True)

    # --- upconv formulations at the final level (256 -> 512), batch 18 ---
    x512in = jnp.asarray(rng.randn(18, 256, 256, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((C,), jnp.bfloat16)

    def upconv_naive(x):
        up = _nearest2x(x)
        return jax.lax.conv_general_dilated(
            up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    def upconv_poly(x):
        return _upsample2x_conv3x3(x, w, bias, dtype=jnp.bfloat16)

    # conv3x3(nearest2x(x)) == ONE input-dilated conv with the derived 4x4
    # kernel K4 = T w T^T, T = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] (verified
    # exact) — no phase interleave / depth-to-space layout passes.
    T4 = jnp.asarray([[1., 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]],
                     jnp.bfloat16)

    def upconv_dilated(x):
        K4 = jnp.einsum("ur,vs,rsio->uvio", T4, T4, w)
        return jax.lax.conv_general_dilated(
            x, K4, (1, 1), padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    for name, fn in (("upconv_naive", upconv_naive),
                     ("upconv_poly", upconv_poly),
                     ("upconv_dilated", upconv_dilated)):
        ms = timeit(fn, x512in, a.iters)
        results[name] = ms
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)

    # same three at the sparse-tile PATCH scale (4608 = 18 x 256 tiles of
    # 12x12 input px) — the interleave layout thrash is worst here (xprof:
    # pad_maximum 8.1 ms + 2x maximum_bitcast 4.1 ms per rollout)
    xpatch = jnp.asarray(rng.randn(4608, 12, 12, C), jnp.bfloat16)
    for name, fn in (("patch_naive", upconv_naive),
                     ("patch_poly", upconv_poly),
                     ("patch_dilated", upconv_dilated)):
        ms = timeit(fn, xpatch, a.iters)
        results[name] = ms
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)

    # --- bare conv3x3 at 512^2, batch 18 (MXU efficiency reference) ---
    x512 = jnp.asarray(rng.randn(18, 512, 512, C), jnp.bfloat16)

    def conv3x3(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms = timeit(conv3x3, x512, a.iters)
    flops = 18 * 512 * 512 * 9 * C * C * 2
    print(json.dumps({"variant": "conv3x3_512_b18", "ms": round(ms, 2),
                      "tflops": round(flops / ms / 1e9, 1),
                      "mxu_pct_of_197T": round(flops / ms / 1e9 / 197 * 100, 1)}),
          flush=True)

    # --- GroupNorm alone at 512^2, batch 18 ---
    gn = nn.GroupNorm(num_groups=32, dtype=jnp.bfloat16)
    vgn = gn.init(jax.random.PRNGKey(0), x512)
    ms = timeit(lambda y: gn.apply(vgn, y), x512, a.iters)
    print(json.dumps({"variant": "groupnorm_512_b18", "ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
