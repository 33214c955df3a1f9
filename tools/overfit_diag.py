"""Stage-1 convergence diagnosis (VERDICT r4 #1).

The r4 overfit runs collapse all-white by step 25 (coverage 0.17 -> 0.000,
PSNR pinned 10.48) while the composite loss keeps falling. Two competing
hypotheses, distinguished by measurement:

  (a) the NOVEL-VIEW photometric term prefers white — i.e. the gaussians
      re-rendered from the test cameras are misaligned with the GT novel
      frames, so vanishing the body is the true optimum of 4/5 views;
  (b) optimizer dynamics — Adam's elementwise steps on the zero-init heads
      move the opacity logit by O(lr * sum|feat|) per step, crashing it to
      saturated-negative before the color/position heads learn anything.

This tool prints, at init: every loss term, the SAME terms for an all-white
render (the collapse attractor), and per-view L1 — then runs a short
instrumented control at the REFERENCE lr 5e-5 (train_stage1.yaml:4) logging
per-term losses + opacity/scale logit stats every step.

Usage:
  python tools/overfit_diag.py [--steps 40] [--lr 5e-5] [--image-size 512]
      [--dump-dir .runs/diag] [--warmup 0]
"""

from __future__ import annotations

import argparse
import dataclasses
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

from overfit_bench import build_subject_batches, render_gt  # noqa: E402


def dump_png(path, chw_or_hwc):
    from PIL import Image
    img = np.asarray(chw_or_hwc, np.float32)
    if img.ndim == 3 and img.shape[0] == 3:
        img = np.transpose(img, (1, 2, 0))
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--dump-dir", default=".runs/diag")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.ops.splat import render_multi_view
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from audio_motion_avatar_tpu.training import stage1
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer)
    from audio_motion_avatar_tpu.utils import losses as L

    print(f"[diag] backend={jax.default_backend()}")
    sz = (args.image_size, args.image_size)
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
    test.video = render_gt(smplx_model, test, sz)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref, test = jx(ref), jx(test)

    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]

    os.makedirs(args.dump_dir, exist_ok=True)

    # ---- init-state forensics: ref render, novel renders, white baseline
    @jax.jit
    def init_forensics(params):
        out = model.apply({"params": params}, statics, ref.video,
                          ref.smpl_parms, ref.cam_parms)
        ref_hwc = jnp.transpose(ref.video, (0, 1, 3, 4, 2))
        B = ref.video.shape[0]
        gaussians_b = {k: v.reshape((B, -1) + v.shape[1:])[:, 0]
                       for k, v in out.gaussians.items() if k != "shs"}
        H, W = cfg.image_size
        novel = render_multi_view(gaussians_b, test.cam_parms["intrinsic"],
                                  test.cam_parms["extrinsic"], W, H,
                                  max_per_tile=cfg.max_per_tile,
                                  sh_degree=None if cfg.rgb else cfg.sh_degree)
        test_hwc = jnp.transpose(test.video, (0, 1, 3, 4, 2))
        white_r = jnp.ones_like(ref_hwc)
        white_t = jnp.ones_like(test_hwc)
        r32 = out.rendered_images.astype(jnp.float32)
        n32 = novel.astype(jnp.float32)
        per_view_l1 = jnp.mean(jnp.abs(n32 - test_hwc), axis=(2, 3, 4))
        per_view_white = jnp.mean(jnp.abs(white_t - test_hwc), axis=(2, 3, 4))
        stats = {
            "l1_ref_init": L.l1_loss(r32, ref_hwc),
            "l1_ref_white": L.l1_loss(white_r, ref_hwc),
            "ssim_ref_init": L.ssim(r32, ref_hwc),
            "ssim_ref_white": L.ssim(white_r, ref_hwc),
            "l1_novel_init": L.l1_loss(n32, test_hwc),
            "l1_novel_white": L.l1_loss(white_t, test_hwc),
            "ssim_novel_init": L.ssim(n32, test_hwc),
            "ssim_novel_white": L.ssim(white_t, test_hwc),
            "novel_cov": jnp.mean((jnp.min(n32, axis=-1) < 0.98)),
            "ref_cov": jnp.mean((jnp.min(r32, axis=-1) < 0.98)),
        }
        return stats, out.rendered_images, novel, per_view_l1, per_view_white

    stats, ref_render, novel_render, pv_l1, pv_white = init_forensics(params)
    stats = {k: round(float(v), 5) for k, v in stats.items()}
    print("[diag:init] " + json.dumps(stats))
    print("[diag:init] per-novel-view L1 (init):  "
          + " ".join(f"{v:.4f}" for v in np.asarray(pv_l1).ravel()))
    print("[diag:init] per-novel-view L1 (white): "
          + " ".join(f"{v:.4f}" for v in np.asarray(pv_white).ravel()))
    verdict_a = stats["l1_novel_init"] > stats["l1_novel_white"]
    print(f"[diag:init] hypothesis (a) novel-misalignment: "
          f"{'SUPPORTED' if verdict_a else 'refuted'} "
          f"(init novel L1 {stats['l1_novel_init']} vs white "
          f"{stats['l1_novel_white']})")

    dump_png(os.path.join(args.dump_dir, "init_ref_render.png"),
             np.asarray(ref_render[0, 0]))
    dump_png(os.path.join(args.dump_dir, "gt_ref.png"),
             np.asarray(ref.video[0, 0]))
    for t in range(novel_render.shape[1]):
        dump_png(os.path.join(args.dump_dir, f"init_novel_{t}.png"),
                 np.asarray(novel_render[0, t]))
        dump_png(os.path.join(args.dump_dir, f"gt_novel_{t}.png"),
                 np.asarray(test.video[0, t]))
    print(f"[diag:init] renders dumped to {args.dump_dir}")

    # ---- short instrumented control at the requested lr
    tx = make_optimizer(OptimConfig(learning_rate=args.lr,
                                    total_steps=max(args.steps, 1),
                                    grad_clip=1.0,
                                    warmup_steps=args.warmup))
    state = TrainState.create(params, tx)
    step = stage1.make_train_step(model, statics, cfg)

    keys = ["loss", "l1_train", "ssim_train", "l1_test", "ssim_test",
            "smplx_param_loss", "grad_norm", "opacity_logit_mean",
            "opacity_logit_min", "opacity_logit_max", "opacity_act_mean",
            "scale_logit_mean", "scale_act_mean"]
    t0 = time.time()
    curve = []
    for s in range(args.steps):
        state, metrics = step(state, ref, test)
        row = {k: round(float(metrics[k]), 5) for k in keys if k in metrics}
        row["step"] = s
        curve.append(row)
        print(f"[diag] {s:3d} " + " ".join(
            f"{k}={row[k]:.4f}" for k in keys if k in row)
            + f" ({time.time()-t0:.0f}s)")
    with open(os.path.join(args.dump_dir, "diag_curve.json"), "w") as f:
        json.dump({"init": stats, "lr": args.lr, "curve": curve}, f, indent=1)
    print(f"[diag] done; curve -> {args.dump_dir}/diag_curve.json")


if __name__ == "__main__":
    main()
