"""Stage-1 overfit convergence at full dims (VERDICT r2 #10).

Demonstrates that the FULL train loop — Sapiens-geometry encoder stand-in,
fusion transformer, upsampler, PTv3 refiner, splat renderer — converges
well past the unit-test horizon: one renderable synthetic subject, N Adam
steps, PSNR-over-steps curve printed as JSON.

The target is *fittable by construction*: ground-truth frames are rendered
with the same splat renderer from a fixed Gaussian body (Gaussians anchored
on the posed SMPLX vertices, smooth procedural colors), from the exact
cameras the batch carries — the image the model must learn to produce is in
its output space, so PSNR is meaningful (reference train semantics:
src/models/lightning_model_wrapper.py:82-171).

Usage:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
      python tools/overfit_bench.py [--steps 400] [--eval-every 20] \
      [--image-size 512] [--lr 5e-5]
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


def build_subject_batches(smplx_model, image_size, n_test=4, seed=0):
    """One subject: identical SMPLX params on every frame, orbiting cameras.
    Returns (ref_batch, test_batch) with noise video to be replaced."""
    from audio_motion_avatar_tpu.data.synthetic import (make_batch,
                                                        orbit_camera,
                                                        random_smpl_params)

    rng = np.random.RandomState(seed)
    # NEUTRAL pose: during training the renderer poses anchors from the GT
    # params (renderer.py:120-123 semantics — pred smplx only feeds the
    # 0.01 loss), and neutral keeps the silhouette maximally simple. Note
    # the earlier all-white collapses (psnr pinned 12.31 posed / 12.18
    # neutral) were NOT an anchor-overlap problem: tools/overfit_debug
    # showed a healthy 0.17-coverage init render; the first full-lr Adam
    # step saturated the zero-init opacity head (see OptimConfig.
    # warmup_steps) against a white-ambiguous target (see the dark GT
    # palette in render_gt).
    one = random_smpl_params(rng, (1, 1), pose_scale=0.0)

    def tile(params, T):
        return {k: np.repeat(v, T, axis=1) for k, v in params.items()}

    ref = make_batch(1, 1, image_size, seed=seed)
    test = make_batch(1, n_test, image_size, seed=seed + 1)
    ref.smpl_parms = tile(one, 1)
    test.smpl_parms = tile(one, n_test)

    # deterministic orbit: ref at the front, tests spread around
    H, W = image_size
    Ks, Es = [], []
    for t in range(1 + n_test):
        K, E = orbit_camera(angle=t * (2 * np.pi / (1 + n_test)),
                            image_size=image_size, focal=max(H, W) * 1.2)
        Ks.append(K)
        Es.append(E)
    ref.cam_parms["intrinsic"] = np.stack(Ks[:1])[None]
    ref.cam_parms["extrinsic"] = np.stack(Es[:1])[None]
    test.cam_parms["intrinsic"] = np.stack(Ks[1:])[None]
    test.cam_parms["extrinsic"] = np.stack(Es[1:])[None]
    return ref, test


def render_gt(smplx_model, batch, image_size, flat_hand_mean=True):
    """Splat a fixed Gaussian body (verts from the batch's SMPLX params,
    smooth positional colors) from the batch cameras -> (B,T,3,H,W)."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.ops.splat import render_batch

    H, W = image_size
    B, T = batch.cam_parms["extrinsic"].shape[:2]
    verts = smplx_ops.forward(
        smplx_model, {k: jnp.asarray(v) for k, v in batch.smpl_parms.items()},
        flat_hand_mean=flat_hand_mean)  # (B*T, V, 3)
    verts = verts.reshape(B, T, -1, 3)
    N = verts.shape[2]
    v0 = verts[0, 0]
    # DARK palette (range ~[0.04, 0.6], mean ~0.32): with body colors
    # centered on the init render's 0.5 gray over a white background, the
    # pixelwise L1 optimum at init is ambiguous between "match the body"
    # and "fade to white" — observed collapse to all-white (opacity logit
    # saturated, photometric gradient dead, tools/overfit_debug.py). Far-
    # from-white GT makes visibility strictly loss-reducing on every body
    # pixel, so the overfit target is gradient-identifiable by construction.
    colors = 0.32 + 0.28 * jnp.sin(v0 * jnp.asarray([9.0, 7.0, 11.0]) +
                                   jnp.asarray([0.0, 2.1, 4.2]))
    gaussians = {
        "xyz": verts,
        "rot": jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, T, N, 4)),
        # activate_scales: min(exp(s-3.9), 0.1); raw for a ~8mm gaussian
        "scale": jnp.full((B, T, N, 3), np.log(0.008) + 3.9),
        "opacity": jnp.full((B, T, N), 4.0),  # sigmoid -> 0.982
        "color": jnp.broadcast_to(colors, (B, T, N, 3)),
    }
    imgs = render_batch(gaussians, jnp.asarray(batch.cam_parms["intrinsic"]),
                        jnp.asarray(batch.cam_parms["extrinsic"]), W, H)
    return np.transpose(np.asarray(imgs), (0, 1, 4, 2, 3)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=100,
                    help="linear LR warmup steps (see OptimConfig.warmup_"
                         "steps — full-lr first steps saturate the zero-"
                         "init opacity head)")
    ap.add_argument("--dump-dir", default=None,
                    help="save GT + periodic renders as PNGs")
    ap.add_argument("--determinism-probe", type=int, default=0,
                    help="N: render the init params N times, print pairwise "
                         "max|diff| + per-render host PSNR/coverage, then "
                         "exit. Round-5 probe: a zero-lr warmup step left "
                         "params bit-identical (all in-grad metrics equal) "
                         "yet the eval render moved 14.01->12.65 dB — "
                         "large-program nondeterminism on the axon backend")
    ap.add_argument("--no-donate", action="store_true",
                    help="train step without donating the state buffers "
                         "(axon aliasing-corruption control, round 5)")
    ap.add_argument("--save-params", default=None,
                    help="pickle the params pytree here every 200 steps and "
                         "at the end (feeds the golden-demo fixture, "
                         "VERDICT r4 #7)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from audio_motion_avatar_tpu.training import stage1
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer)

    print(f"[overfit] backend={jax.default_backend()}")
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
    print("[overfit] rendering GT target...")
    ref.video = render_gt(smplx_model, ref, sz)
    test.video = render_gt(smplx_model, test, sz)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)  # noqa: E731
    ref, test = jx(ref), jx(test)

    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]
    tx = make_optimizer(OptimConfig(learning_rate=args.lr,
                                    total_steps=args.steps, grad_clip=1.0,
                                    warmup_steps=args.warmup))
    state = TrainState.create(params, tx)
    step = stage1.make_train_step(model, statics, cfg,
                                  donate=not args.no_donate)
    render = stage1.make_render_fn(model, statics)

    def bad_leaves(params):
        """Host-side non-finite scan of the small render-head subtrees —
        corruption detector (round-5: white-render collapse with finite
        in-jit stats points at a poisoned parameter branch)."""
        bad = []
        for name in ("renderer",):
            sub = params.get(name)
            if sub is None:
                continue
            flat = jax.tree_util.tree_flatten_with_path(sub)[0]
            for path, leaf in flat:
                a = np.asarray(leaf)
                n = int((~np.isfinite(a)).sum())
                if n:
                    bad.append((name + jax.tree_util.keystr(path), n))
        return bad

    def psnr(params):
        # HOST-side metric computation: on this image's axon backend, large
        # jit programs were caught computing reductions against closure
        # arrays wrongly (r5, tools/grad_render_probe.py: pure-jit L1
        # 0.13846 vs host truth 0.10061 on bit-identical images). Transfer
        # the render and evaluate in numpy — PNGs and curve then can't lie.
        rendered, target = render(params, ref)
        r32 = np.asarray(rendered, np.float32)
        t32 = np.asarray(target, np.float32)
        mse = float(np.mean((r32 - t32) ** 2))
        # body coverage: fraction of non-white pixels — 0.0 flags the
        # all-white collapse mode immediately
        cov = float(np.mean(r32.min(axis=-1) < 0.98))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12)), r32, cov

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        from PIL import Image
        gt = np.transpose(np.asarray(ref.video[0, 0]), (1, 2, 0))
        Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.dump_dir, "gt_ref.png"))

    if args.determinism_probe:
        renders = []
        for i in range(args.determinism_probe):
            p, r32, cov = psnr(state.params)
            renders.append(r32)
            print(f"[determinism] render {i}: psnr={p:.3f} cov={cov:.4f}",
                  flush=True)
        base = renders[0]
        for i, r in enumerate(renders[1:], 1):
            d = float(np.abs(r - base).max())
            print(f"[determinism] max|render_{i} - render_0| = {d:.6f}",
                  flush=True)
        # one zero-update train step (warmup lr=0 at count 0), then render
        # again: params are bit-identical, so any render change is backend
        # nondeterminism, not training
        state2, m0 = step(state, ref, test)
        p, r32, cov = psnr(state2.params)
        d = float(np.abs(r32 - base).max())
        print(f"[determinism] after zero-lr step: psnr={p:.3f} "
              f"cov={cov:.4f} max|diff vs render_0|={d:.6f} "
              f"loss={float(m0['loss']):.6f}", flush=True)
        return

    def save_params(params):
        if not args.save_params:
            return
        import pickle
        host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
        tmp = args.save_params + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(host, f)
        os.replace(tmp, args.save_params)

    # per-term keys (VERDICT r4 weak #1: a single composite scalar hid
    # WHICH term kept falling through the all-white collapse). These come
    # from inside the value_and_grad jit — the side the round-5 probes
    # showed agrees with the host-side truth on this backend.
    TERMS = ("l1_train", "ssim_train", "l1_test", "ssim_test",
             "smplx_param_loss", "opacity_logit_mean", "opacity_act_mean",
             "scale_act_mean", "grad_norm")
    curve = []
    t_start = time.time()
    for s in range(args.steps):
        state, metrics = step(state, ref, test)
        if s % args.eval_every == 0 or s == args.steps - 1:
            p, rendered, cov = psnr(state.params)
            loss = float(metrics["loss"])
            row = {"step": s, "loss": round(loss, 5),
                   "psnr": round(p, 3), "coverage": round(cov, 4)}
            row.update({k: round(float(metrics[k]), 5) for k in TERMS
                        if k in metrics})
            curve.append(row)
            print(f"[overfit] step {s:4d} loss={loss:.5f} psnr={p:.2f} "
                  f"cov={cov:.3f} l1_ref={row.get('l1_train', -1):.4f} "
                  f"l1_nov={row.get('l1_test', -1):.4f} "
                  f"smplx={row.get('smplx_param_loss', -1):.4f} "
                  f"op_act={row.get('opacity_act_mean', -1):.4f} "
                  f"sc_act={row.get('scale_act_mean', -1):.5f} "
                  f"gnorm={row.get('grad_norm', -1):.2e} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
            bad = bad_leaves(state.params)
            if bad:
                print(f"[overfit] NON-FINITE params: {bad[:8]}", flush=True)
            if args.dump_dir and s % (args.eval_every * 5) == 0:
                from PIL import Image
                img = np.clip(np.asarray(rendered[0, 0]), 0, 1)
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(args.dump_dir, f"render_{s:05d}.png"))
        if args.save_params and s and s % 200 == 0:
            save_params(state.params)
    save_params(state.params)

    print(json.dumps({"metric": "stage1_overfit_psnr",
                      "final_psnr": curve[-1]["psnr"],
                      "steps": args.steps, "image_size": args.image_size,
                      "curve": curve}))


if __name__ == "__main__":
    main()
