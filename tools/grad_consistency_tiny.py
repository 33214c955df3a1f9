"""Fast pure-vs-in-grad forward consistency bisect (stage-1 collapse, r5).

The 512px diag (.runs/diag_r5.log) shows stage1_loss returns DIFFERENT
photometric values when evaluated under jax.value_and_grad than under plain
jit at the SAME params — which mathematically cannot happen unless a
custom_vjp fwd rule diverges from its primal, a Pallas kernel miscompiles /
overwrites memory in the grad graph, or the backend miscompiles the larger
fused graph. This tool reproduces the comparison in SECONDS on the tiny
config so the trigger can be bisected: splat mode, compute dtype, remat,
image size, backend.

Usage:
  python tools/grad_consistency_tiny.py [--splat-mode pallas|tiles|naive]
      [--image-size 64] [--dtype bfloat16|float32] [--no-remat] [--full-dims]
  JAX_PLATFORMS=cpu python tools/grad_consistency_tiny.py   # CPU control
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splat-mode", default="pallas")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--full-dims", action="store_true",
                    help="full AvatarConfig dims instead of tiny()")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel import mesh as pmesh
    from audio_motion_avatar_tpu.training import stage1

    sz = (args.image_size, args.image_size)
    base = AvatarConfig() if args.full_dims else AvatarConfig.tiny()
    cfg = dataclasses.replace(
        base, image_size=sz, compute_dtype=args.dtype,
        splat_mode=args.splat_mode,
        frames_scan_remat=not args.no_remat)
    print(f"[tiny-probe] backend={jax.default_backend()} size={sz} "
          f"splat={args.splat_mode} dtype={args.dtype} "
          f"remat={cfg.frames_scan_remat} full_dims={args.full_dims}",
          flush=True)

    if args.full_dims:
        smplx_model = smplx_ops.synthetic_model(seed=0)
        statics = build_renderer_statics(
            smplx_model, subdivide_steps=cfg.subdivide_steps,
            densify=cfg.densify_smplx_verts)
        nverts = int(smplx_model.v_template.shape[0])
    else:
        smplx_model = smplx_ops.synthetic_model(seed=0, num_verts=300)
        statics = build_renderer_statics(smplx_model, subdivide_steps=0)
        nverts = 300
    nv_enc = nverts + int(np.asarray(smplx_model.faces).shape[0])
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    model = TriplaneGaussianAvatar(cfg=cfg, num_verts_encoder=nv_enc,
                                   point_refiner=build_point_refiner(cfg)
                                   if args.full_dims else None)

    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref = jx(make_batch(1, 1, sz, seed=1))
    test = jx(make_batch(1, 2, sz, seed=2))
    cam = ref.cam_parms
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, cam)
    params = pmesh.unbox(variables)["params"]

    def loss_fn(p):
        return stage1.stage1_loss(model, p, statics, ref, test, cfg)

    keys = ["loss", "l1_train", "ssim_train", "l1_test", "ssim_test",
            "smplx_param_loss"]

    pure = jax.jit(loss_fn)
    _, m_pure = pure(params)
    m_pure = {k: float(m_pure[k]) for k in keys}
    print("[tiny-probe] pure    " + " ".join(
        f"{k}={m_pure[k]:.6f}" for k in keys), flush=True)

    graded = jax.jit(lambda p: jax.value_and_grad(
        loss_fn, has_aux=True)(p)[0])
    _, m_grad = graded(params)
    m_grad = {k: float(m_grad[k]) for k in keys}
    print("[tiny-probe] in-grad " + " ".join(
        f"{k}={m_grad[k]:.6f}" for k in keys), flush=True)

    worst = max(abs(m_pure[k] - m_grad[k]) for k in keys)
    tol = 2e-2 if args.dtype == "bfloat16" else 1e-4
    status = "MATCH" if worst < tol else "DIVERGED"
    print(f"[tiny-probe] {status} (max metric delta {worst:.6f}, tol {tol})")
    return 0 if status == "MATCH" else 1


if __name__ == "__main__":
    sys.exit(main())
