"""Stage-2 overfit smoke at full dims (VERDICT r4 next #2).

Proves the audio-driven trainer LEARNS: one synthetic talking-clip
(fittable-by-construction GT rendered with the same splat renderer from a
gently-moving Gaussian body), full-dim AudioDrivenAvatar — AR rollout,
prediction-cache curriculum exercised — trained until the photometric curve
demonstrably decreases and the rollout renders are non-blank.

Reference semantics being exercised: AudioDrivenTriplaneAvatarLightning
.training_step (src/models/lightning_model_wrapper.py:418-572) — stop-grad
stage-1 pass, cache replacement, 10*(L1+0.1*SSIM)+0.05*smplx loss.

All reported curves are computed HOST-SIDE on transferred renders: on this
image's axon backend large jit programs were caught misreducing against
closure arrays (tools/grad_render_probe.py, round 5) — device-side scalar
metrics are printed for reference but the host l1/PSNR is the truth.

Usage:
  python tools/overfit_stage2.py [--steps 300] [--image-size 384]
      [--lr 1e-4] [--cache-prob 0.3] [--dump-dir .runs/overfit2_r5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def build_clip(image_size, t_in, t_out, seed=0):
    """One clip: slight per-frame pose motion, fixed front camera, fixed
    random 'audio' features (the net memorizes the audio->motion map)."""
    from audio_motion_avatar_tpu.data.synthetic import (make_batch,
                                                        orbit_camera,
                                                        random_smpl_params)

    rng = np.random.RandomState(seed)
    base = random_smpl_params(rng, (1, 1), pose_scale=0.0)
    # a small smooth motion on the body pose: frame t = t * delta
    delta = (rng.randn(*base["body_pose"].shape) * 0.02).astype(np.float32)

    def clip_params(t0, T):
        out = {}
        for k, v in base.items():
            frames = [v[:, 0]] * T
            out[k] = np.stack(frames, axis=1).copy()
        for t in range(T):
            out["body_pose"][:, t] += delta[:, 0] * (t0 + t)
        return out

    ref = make_batch(1, t_in, image_size, seed=seed)
    tgt = make_batch(1, t_out, image_size, seed=seed + 1, with_audio=True)
    ref.smpl_parms = clip_params(0, t_in)
    tgt.smpl_parms = clip_params(t_in, t_out)

    H, W = image_size
    K, E = orbit_camera(angle=0.0, image_size=image_size, focal=max(H, W) * 1.2)
    for b in (ref, tgt):
        T = b.cam_parms["extrinsic"].shape[1]
        b.cam_parms["intrinsic"] = np.tile(K[None, None], (1, T, 1, 1))
        b.cam_parms["extrinsic"] = np.tile(E[None, None], (1, T, 1, 1))
    return ref, tgt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--lr", type=float, default=1e-4)  # train_stage2.yaml:4
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--cache-prob", type=float, default=0.3)
    ap.add_argument("--dump-dir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.audio_avatar import AudioDrivenAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from audio_motion_avatar_tpu.training import stage2
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer)
    from tools.overfit_bench import render_gt

    print(f"[overfit2] backend={jax.default_backend()}")
    sz = (args.image_size, args.image_size)
    cfg = dataclasses.replace(AvatarConfig(), image_size=sz,
                              compute_dtype="bfloat16")
    smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    model = AudioDrivenAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                              point_refiner=build_point_refiner(cfg))

    ref, tgt = build_clip(sz, cfg.triplane_input_frames,
                          cfg.triplane_output_frames)
    print("[overfit2] rendering GT clip...")
    ref.video = render_gt(smplx_model, ref, sz)
    tgt.video = render_gt(smplx_model, tgt, sz)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref, tgt = jx(ref), jx(tgt)
    tgt_np = np.transpose(np.asarray(tgt.video, np.float32), (0, 1, 3, 4, 2))

    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms,
                           tgt.audio_features, tgt.cam_parms)
    params = unbox(variables)["params"]
    tx = make_optimizer(OptimConfig(learning_rate=args.lr,
                                    total_steps=args.steps, grad_clip=1.0,
                                    warmup_steps=args.warmup))
    state = TrainState.create(params, tx)
    loop = stage2.Stage2TrainLoop(model, statics, cfg,
                                  replacement_prob=args.cache_prob)

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        from PIL import Image
        Image.fromarray((np.clip(tgt_np[0, -1], 0, 1) * 255).astype(
            np.uint8)).save(os.path.join(args.dump_dir, "gt_target_last.png"))

    curve = []
    cache_hits = 0
    t0 = time.time()
    for s in range(args.steps):
        # batch ids cycle 0,12,24 so the +12-future cache keys land on real
        # future steps and the curriculum actually self-feeds
        bid = (s % 3) * stage2.CACHE_FUTURE_OFFSET
        state, m = loop.run_step(state, ref, tgt, batch_id=bid)
        cache_hits += int(m["cache_iter"] > 0)
        if s % args.eval_every == 0 or s == args.steps - 1:
            r32 = np.asarray(loop.last_rendered, np.float32)
            l1_host = float(np.mean(np.abs(r32 - tgt_np)))
            mse = float(np.mean((r32 - tgt_np) ** 2))
            psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
            cov = float(np.mean(r32.min(axis=-1) < 0.98))
            curve.append({"step": s, "l1_host": round(l1_host, 5),
                          "psnr": round(psnr, 3), "coverage": round(cov, 4),
                          "loss_dev": round(float(m["loss"]), 5)})
            print(f"[overfit2] step {s:4d} l1_host={l1_host:.5f} "
                  f"psnr={psnr:.2f} cov={cov:.3f} cache_hits={cache_hits} "
                  f"loss_dev={float(m['loss']):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
            if args.dump_dir and s % (args.eval_every * 5) == 0:
                from PIL import Image
                img = np.clip(r32[0, -1], 0, 1)
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(args.dump_dir, f"rollout_{s:05d}.png"))

    print(json.dumps({"metric": "stage2_overfit", "final": curve[-1],
                      "first": curve[0], "cache_hits": cache_hits,
                      "steps": args.steps, "image_size": args.image_size,
                      "curve": curve}))


if __name__ == "__main__":
    main()
