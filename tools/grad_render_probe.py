"""Probe: does model.apply's render differ inside value_and_grad?

Diag r5 found: at identical init params, pure forward renders the body
(l1 0.1508, cov 0.17) while the metrics logged from INSIDE the jitted
value_and_grad step read l1 0.0768 at step 0 and exactly-all-white from
step 1 on, with photometric grads apparently zero. This isolates where.

Usage: python tools/grad_render_probe.py [--image-size 512]
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

import numpy as np

from overfit_bench import build_subject_batches, render_gt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--splat-mode", default=None,
                    help="override cfg.splat_mode (pallas|tiles|naive) to "
                         "bisect whether the in-grad divergence needs the "
                         "Pallas composite")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable the renderer frame-scan nn.remat to "
                         "bisect whether the in-grad divergence needs the "
                         "remat recompute")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox

    sz = (args.image_size, args.image_size)
    over = {}
    if args.splat_mode:
        over["splat_mode"] = args.splat_mode
    if args.no_remat:
        over["frames_scan_remat"] = False
    cfg = dataclasses.replace(AvatarConfig(), image_size=sz,
                              compute_dtype="bfloat16", **over)
    smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    model = TriplaneGaussianAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                                   point_refiner=build_point_refiner(cfg))

    ref, test = build_subject_batches(smplx_model, sz)
    ref.video = render_gt(smplx_model, ref, sz)
    test.video = render_gt(smplx_model, test, sz)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref, test = jx(ref), jx(test)

    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]
    ref_hwc = jnp.transpose(ref.video, (0, 1, 3, 4, 2))

    def fwd(params):
        out = model.apply({"params": params}, statics, ref.video,
                          ref.smpl_parms, ref.cam_parms)
        r32 = out.rendered_images.astype(jnp.float32)
        l1 = jnp.mean(jnp.abs(r32 - ref_hwc))
        cov = jnp.mean((jnp.min(r32, axis=-1) < 0.98))
        op = out.gaussians["opacity"].astype(jnp.float32)
        return l1, (cov, jnp.mean(op), r32)

    gt_np = np.asarray(ref_hwc, np.float32)

    pure = jax.jit(fwd)
    l1_p, (cov_p, op_p, img_p) = pure(params)
    img_p = np.asarray(img_p)
    host_l1_p = float(np.mean(np.abs(img_p - gt_np)))
    host_cov_p = float(np.mean(np.min(img_p, axis=-1) < 0.98))
    print(f"[probe] pure     l1={float(l1_p):.5f} cov={float(cov_p):.4f} "
          f"op_logit_mean={float(op_p):.4f} "
          f"HOST l1={host_l1_p:.5f} cov={host_cov_p:.4f}", flush=True)

    # memory-lean graded probe: grad norms reduced IN-jit (a full grad tree
    # + params + pure outputs OOMed 16G at 512/256 full dims)
    import flax.traverse_util as tu

    @jax.jit
    def graded(p):
        (l1, (cov, op, img)), grads = jax.value_and_grad(
            fwd, has_aux=True)(p)
        flat = tu.flatten_dict(grads, sep="/")
        head_norms = {k: jnp.linalg.norm(v) for k, v in flat.items()
                      if any(s in k for s in ("opacity_layer", "shs_layer",
                                              "xyz_layer", "scaling_layer"))}
        total = jnp.sqrt(sum(jnp.sum(v * v) for v in flat.values()))
        return l1, cov, op, img, head_norms, total

    l1_g, cov_g, op_g, img_g, head_norms, total = graded(params)
    img_g_np = np.asarray(img_g)
    host_l1_g = float(np.mean(np.abs(img_g_np - gt_np)))
    print(f"[probe] in-grad  l1={float(l1_g):.5f} cov={float(cov_g):.4f} "
          f"op_logit_mean={float(op_g):.4f} HOST l1={host_l1_g:.5f}",
          flush=True)

    d = float(jnp.max(jnp.abs(img_p - np.asarray(img_g))))
    print(f"[probe] max|img_pure - img_grad| = {d:.6f}")
    for k, v in sorted(head_norms.items()):
        print(f"[probe] |grad {k}| norm={float(v):.3e}")
    print(f"[probe] total grad norm = {float(total):.3e}")


if __name__ == "__main__":
    main()
