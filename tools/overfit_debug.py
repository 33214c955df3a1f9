"""Diagnose the overfit bench's all-white render at init (ROUND4).

Builds the exact overfit_bench setup (full dims, neutral-pose subject,
orbit cameras), runs ONE forward at init, and prints per-stage stats:
GT pixel stats, model render stats, gaussian attribute distributions
(opacity, scales, screen-space positions/radii vs the GT body's), so the
stage that loses the body is visible directly.
"""

import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)

import numpy as np


def stats(name, x):
    x = np.asarray(x, np.float32)
    print(json.dumps({"t": name, "shape": list(x.shape),
                      "min": round(float(x.min()), 4),
                      "mean": round(float(x.mean()), 4),
                      "max": round(float(x.max()), 4),
                      "finite_frac": round(float(np.isfinite(x).mean()), 4)}),
          flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=512)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.ops import splat
    from audio_motion_avatar_tpu.ops.cameras import make_camera
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from tools.overfit_bench import build_subject_batches, render_gt

    print(f"[dbg] backend={jax.default_backend()}")
    sz = (a.image_size, a.image_size)
    cfg = dataclasses.replace(AvatarConfig(), image_size=sz,
                              compute_dtype="bfloat16")
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
    stats("gt_ref_video", ref.video)
    gt_cov = float((ref.video.min(axis=2) < 0.98).mean())
    print(f"[dbg] GT coverage (non-white frac): {gt_cov:.4f}", flush=True)

    # where the GT body lands on screen
    verts = smplx_ops.forward(
        smplx_model,
        {k: jnp.asarray(v) for k, v in ref.smpl_parms.items()})
    stats("gt_verts_world", verts)
    K = jnp.asarray(ref.cam_parms["intrinsic"])[0, 0]
    E = jnp.asarray(ref.cam_parms["extrinsic"])[0, 0]
    cam = make_camera(K, E, a.image_size, a.image_size)
    v_cam = (verts[0] @ np.asarray(cam.view)[:3, :3].T
             + np.asarray(cam.view)[:3, 3])
    stats("gt_verts_cam_z", v_cam[..., 2])

    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref = jx(ref)
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]

    out = jax.jit(lambda p: model.apply({"params": p}, statics, ref.video,
                                        ref.smpl_parms, ref.cam_parms))(params)
    stats("model_rendered", out.rendered_images)
    cov = float((np.asarray(out.rendered_images, np.float32).min(-1)
                 < 0.98).mean())
    print(f"[dbg] model render coverage: {cov:.4f}", flush=True)

    g = out.gaussians
    for k in ("xyz", "scale", "opacity", "color", "rot"):
        if k in g:
            stats(f"gauss_{k}_raw", g[k])
    # activations as the splat wrapper applies them
    stats("gauss_scale_act", np.asarray(
        splat.activate_scales(jnp.asarray(g["scale"]))))
    stats("gauss_opacity_act", np.asarray(
        splat.activate_opacity(jnp.asarray(g["opacity"]))))
    # screen-space: project the predicted gaussian centers
    xyz = np.asarray(g["xyz"], np.float32).reshape(-1, 3)
    pc = xyz @ np.asarray(cam.view)[:3, :3].T + \
        np.asarray(cam.view)[:3, 3]
    stats("gauss_cam_z", pc[..., 2])
    uv = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6) * float(np.asarray(K)[0, 0])
    uv = uv + np.asarray([float(K[0, 2]), float(K[1, 2])])
    inside = ((uv[:, 0] >= 0) & (uv[:, 0] < a.image_size)
              & (uv[:, 1] >= 0) & (uv[:, 1] < a.image_size)
              & (pc[:, 2] > 0.01))
    print(f"[dbg] predicted centers on-screen: {inside.mean():.4f}",
          flush=True)

    # predicted smplx (anchors) vs the GT neutral pose
    ps = out.pred_smpl_2 if hasattr(out, "pred_smpl_2") else None
    if isinstance(ps, dict):
        for k, v in ps.items():
            stats(f"pred_smpl2_{k}", v)


if __name__ == "__main__":
    main()
