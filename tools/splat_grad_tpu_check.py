"""On-TPU isolation check of the Pallas splat composite under autodiff.

Context (r5 stage-1 convergence bug): at 128px full dims, the training loss
computed inside jit(value_and_grad) differs from the pure-jit loss while the
RENDERED IMAGE is bit-identical (tools/grad_render_probe.py) — the reduction
reads different bytes than the image output. The unit tests
(tests/test_splat_pallas.py) run under JAX_PLATFORMS=cpu where Pallas runs
in interpret mode, so the kernels' on-TPU memory behavior (block padding,
DMA write masking) was never exercised where it matters. This tool runs the
kernel pair in isolation ON TPU at training-like shapes and compares:

  1. primal: pallas composite vs the XLA twin (same math)
  2. primal INSIDE value_and_grad vs outside (must be identical)
  3. the loss value vs a loss computed from the aux image (must be identical)
  4. grads: custom-VJP (pallas bwd kernel) vs jax.vjp of the XLA twin

Exit 0 only if all four agree.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)

import numpy as np


def make_tile_params(rng, T, K, tx, frame_tiles):
    """Random plausible packed tile params (T, 9, K): gaussian means near
    their tile, sane conics, ~70% live slots."""
    from audio_motion_avatar_tpu.ops.splat import TILE
    tid = np.arange(T) % frame_tiles
    ox = (tid % tx) * TILE
    oy = (tid // tx) * TILE
    mx = ox[:, None] + rng.uniform(-4, TILE + 4, (T, K))
    my = oy[:, None] + rng.uniform(-4, TILE + 4, (T, K))
    s = rng.uniform(1.5, 6.0, (T, K))
    cxx = 1.0 / (s * s)
    cyy = 1.0 / (s * s) * rng.uniform(0.8, 1.2, (T, K))
    cxy = rng.uniform(-0.2, 0.2, (T, K)) * cxx
    op = rng.uniform(0.05, 0.9, (T, K)) * (rng.uniform(size=(T, K)) < 0.7)
    cr = rng.uniform(0, 1, (T, K))
    cg = rng.uniform(0, 1, (T, K))
    cb = rng.uniform(0, 1, (T, K))
    return np.stack([mx, my, cxx, cxy, cyy, op, cr, cg, cb],
                    axis=1).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import splat_pallas as sp

    print(f"[splat-check] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # training-like shapes at 128px: tx=ty=8, 64 tiles/frame, K=512,
    # frame-stacked grid like the scan path (F=1) and multi-frame (F=5,
    # the novel-view case).
    failures = 0
    for (tx, ty, K, F) in [(8, 8, 512, 1), (8, 8, 512, 5), (32, 32, 512, 1)]:
        frame_tiles = tx * ty
        T = frame_tiles * F
        p_np = make_tile_params(rng, T, K, tx, frame_tiles)
        p = jnp.asarray(p_np)
        origins = jnp.tile(sp._tile_origins(tx, ty), (F, 1))
        gt = jnp.asarray(rng.uniform(0, 1, (T, sp.P, 3)).astype(np.float32))

        def loss_fn(params):
            img = sp.composite_tiles(params, origins, tx, frame_tiles)
            return jnp.mean(jnp.abs(img - gt)), img

        def loss_xla(params):
            img = sp._composite_tiles_xla(params, origins)
            return jnp.mean(jnp.abs(img - gt)), img

        # 1. primal agreement pallas vs xla
        (l_p, img_p) = jax.jit(loss_fn)(p)
        (l_x, img_x) = jax.jit(loss_xla)(p)
        d_img = float(jnp.max(jnp.abs(img_p - img_x)))
        d_l = abs(float(l_p) - float(l_x))

        # 2+3. in-grad primal and loss-vs-aux-image agreement
        (l_g, img_g), grads = jax.jit(
            lambda q: jax.value_and_grad(loss_fn, has_aux=True)(q))(p)
        d_img_g = float(jnp.max(jnp.abs(img_g - img_p)))
        d_l_g = abs(float(l_g) - float(l_p))
        l_from_aux = float(jnp.mean(jnp.abs(img_g - gt)))
        d_aux = abs(float(l_g) - l_from_aux)

        # 4. grads vs XLA-twin vjp
        _, vjp = jax.vjp(lambda q: loss_xla(q)[0], p)
        (g_x,) = vjp(jnp.ones(()))
        rel = float(jnp.max(jnp.abs(grads - g_x)) /
                    (jnp.max(jnp.abs(g_x)) + 1e-8))

        ok = (d_img < 2e-5 and d_l < 1e-5 and d_img_g < 1e-6
              and d_l_g < 1e-5 and d_aux < 1e-5 and rel < 5e-3)
        failures += 0 if ok else 1
        print(f"[splat-check] tx={tx} K={K} F={F}: "
              f"primal d_img={d_img:.2e} d_l={d_l:.2e} | "
              f"in-grad d_img={d_img_g:.2e} d_l={d_l_g:.2e} "
              f"d_loss_vs_aux={d_aux:.2e} | grad rel={rel:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)

    print(f"[splat-check] {'ALL OK' if failures == 0 else f'{failures} FAIL'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
