"""Stage-2 CLI — train / test / demo the audio-driven avatar.

Interface parity with the reference entry (reference: src/main2.py):
  python -m audio_motion_avatar_tpu.main2 --config <yaml> \
      --mode train|test|demo [--checkpoint ...] [overrides ...]

Demo mode reproduces the reference's inference structure (main2.py:123-388):
one stage-1 pass for the initial token state, then an autoregressive audio
rollout in T_output-frame chunks over TWO interleaved streams (even/odd
12-frame strides), sliding the last-2-frame token window, finally writing
frames + mp4 (+ffmpeg audio mux).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Stage 2: audio-driven avatar")
    p.add_argument("--config", type=str,
                   default=os.path.join(os.path.dirname(__file__), "configs",
                                        "config_stage_2.yaml"))
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test", "demo"])
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--audio", type=str, default=None,
                   help="wav file for demo mode (synthetic tone if absent)")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--prewarm", action="store_true",
                   help="demo mode: compile the serving programs into the "
                        "persistent JAX compile cache (one rollout), then "
                        "exit — a later demo run restores warm in seconds "
                        "instead of the ~5 min cold compile")
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def build_stage2(cfg):
    import jax
    from .configs.build import build_avatar_config
    from .models.audio_avatar import AudioDrivenAvatar
    from .models.renderer import build_renderer_statics
    from .ops import smplx as smplx_ops
    from .main import build_everything  # reuse smplx/statics logic

    ac = build_avatar_config(cfg)
    base_model, statics, _ = build_everything(cfg)
    model = AudioDrivenAvatar(cfg=ac,
                              num_verts_encoder=base_model.num_verts_encoder,
                              point_refiner=base_model.point_refiner)
    return model, statics, ac


def init_state2(model, statics, cfg, ac, seed=0):
    import jax
    import jax.numpy as jnp
    from .configs.build import build_optim_config
    from .data.synthetic import make_batch
    from .parallel.mesh import unbox
    from .training.train_state import TrainState, make_optimizer

    H, W = ac.image_size
    ref = make_batch(1, ac.triplane_input_frames, (H, W), seed=seed)
    tgt = make_batch(1, ac.triplane_output_frames, (H, W), seed=seed + 1,
                     with_audio=True, audio_dim=ac.audio_feature_dim)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
    ref, tgt = jx(ref), jx(tgt)
    variables = model.init(jax.random.PRNGKey(seed), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms, tgt.audio_features,
                           tgt.cam_parms)
    params = unbox(variables)["params"]
    tx = make_optimizer(build_optim_config(cfg))
    return TrainState.create(params, tx)


def _stack_batches(a, b):
    """Concatenate two (B=1, ...) VideoBatch pytrees into one B=2 batch."""
    import jax
    import numpy as np

    def cat(x, y):
        return np.concatenate([np.asarray(x), np.asarray(y)], axis=0)

    return jax.tree_util.tree_map(cat, a, b)


def _concat_frames(batches):
    """Concatenate batch pytrees along the FRAME axis (axis 1) — used by
    the fused-chunk demo to pack a chunk group's targets into one batch."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=1),
        *batches)


def run_demo(cfg, model, statics, ac, state, audio_path, output_path,
             prewarm: bool = False):
    """Two-stream interleaved demo (reference main2.py:142-388).

    Structure parity with the reference demo: stream A consumes dataset
    items i%12==0 (the even video frames, each item a stride-2 window),
    stream B items i%12==1 (odd frames); each stream's token state slides
    by the last T_in predicted frames per chunk (:202-203); per-batch eval
    L1 + SMPLX losses are printed (:206-211); SMPLX mesh overlays are drawn
    on every output frame (:213-220); the streams' frames are interleaved
    (:322-331) into original_sequence.mp4 + smplx_sequence.mp4 with an
    ffmpeg audio mux (:335-384).

    TPU delta: the reference runs the streams as two serial loops; here
    they are BATCHED (B=2) through ONE compiled rollout per chunk — same
    math, half the dispatches, double MXU occupancy.
    """
    import jax
    import jax.numpy as jnp
    from .data.factory import DatasetFactory
    from .ops import smplx as smplx_ops
    from .utils import losses as L
    from .utils.graphics import draw_smplx_on_image
    from .utils.video import write_mp4, write_frames

    H, W = ac.image_size
    T_in = ac.triplane_input_frames
    T_out = ac.triplane_output_frames
    fps = int(cfg.dataset.get("frame_rate", 24))
    out_dir = os.path.join(cfg.training.output_dir, "demo_outputs")
    os.makedirs(out_dir, exist_ok=True)

    dataset = DatasetFactory.create_dataset(cfg, split="val")
    # reference batch index selection (main2.py:157-158, :242-243)
    idx_a = [i for i in range(0, min(320, len(dataset))) if i % 12 == 0]
    idx_b = [i for i in range(0, min(320, len(dataset))) if i % 12 == 1]
    n_chunks = min(len(idx_a), len(idx_b))
    if n_chunks == 0:
        raise ValueError("dataset too small for the two-stream demo")

    # Optional wav: overrides dataset audio features (stream A gets even
    # video-frame features, stream B odd — the streams' frame phases).
    # With no wav AND no dataset audio features, a synthetic tone drives
    # the demo (the CLI's documented fallback) so the pipeline always runs.
    wav_feats = None
    from .models.audio_encoder import (AudioFeatureExtractor,
                                       resample_linear, SAMPLE_RATE)
    wav = None
    if audio_path and os.path.exists(audio_path):
        from .data.speech import load_audio
        raw, sr = load_audio(audio_path)  # wav natively; mp3 via ffmpeg
        wav = resample_linear(raw, sr)
    elif getattr(dataset[idx_a[0]][1], "audio_features", None) is None:
        dur = 2.0 * n_chunks * T_out / fps
        t = np.arange(int(dur * SAMPLE_RATE), dtype=np.float32) / SAMPLE_RATE
        wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))).astype(np.float32)
        print("[demo] no wav / dataset audio -> synthetic tone")
    if wav is not None:
        extractor = AudioFeatureExtractor(
            model_path=cfg.dataset.get("wav2vec2_model_path"),
            dim=ac.audio_feature_dim)
        total = 2 * n_chunks * T_out
        wav_feats = extractor.features_per_video_frame(wav, total, fps)

    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)

    # ---- init token state: both streams' first ref batches, one B=2 pass ----
    ref_a, _, _ = dataset[idx_a[0]]
    ref_b, _, _ = dataset[idx_b[0]]
    ref = jx(_stack_batches(ref_a, ref_b))

    @jax.jit
    def stage1_tokens(params, video, smpl, cam):
        out = model.apply(
            {"params": params}, statics, video, smpl, cam,
            method=lambda m, s, v, sp, c: m.triplane_gaussian(s, v, sp, c,
                                                              render=False))
        return out.triplane_tokens, out.smpl_tokens

    triplanes, smpl_tokens = stage1_tokens(state.params, ref.video,
                                           ref.smpl_parms, ref.cam_parms)

    # demo_fuse_chunks > 1 runs that many consecutive chunks inside ONE
    # jitted program, threading the sliding window in-graph — identical
    # math (tests/test_serve_fuse.py), amortizes the fixed per-dispatch
    # cost (~24 ms/rollout idle on the serving trace). Audio/cams for the
    # group are concatenated on the frame axis and sliced in-graph.
    fuse = max(1, int(getattr(ac, "demo_fuse_chunks", 1)))

    def make_rollout(k):
        @jax.jit
        def rollout(params, triplanes, smpl_tokens, audio_chunks, cam_chunks):
            def m(mdl, tri, smpl, audio, cams):
                from .models.triplane_encoder import reshape_params
                rlist, plist = [], []
                for ci in range(k):
                    aud_c = audio[:, ci * T_out:(ci + 1) * T_out]
                    cam_c = jax.tree_util.tree_map(
                        lambda v: v[:, ci * T_out:(ci + 1) * T_out], cams)
                    out_tri, out_smpl = mdl.audio_triplane(aud_c, tri, smpl)
                    B, T = out_smpl.shape[:2]
                    flat = out_smpl.reshape((B * T,) + out_smpl.shape[2:])
                    pred = reshape_params(
                        mdl.triplane_gaussian.encoder.smpl_decoder(flat),
                        (B, T))
                    rendered, _ = mdl.triplane_gaussian.renderer(
                        statics, out_tri, cam_c, pred)
                    # sliding token window (reference main2.py:202-203)
                    tri = out_tri[:, -T_in:]
                    smpl = out_smpl[:, -T_in:]
                    rlist.append(rendered)
                    plist.append(pred)
                rendered = jnp.concatenate(rlist, axis=1)
                pred = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=1), *plist)
                return rendered, tri, smpl, pred

            return model.apply({"params": params}, triplanes, smpl_tokens,
                               audio_chunks, cam_chunks, method=m)

        return rollout

    rollouts = {fuse: make_rollout(fuse)}
    if fuse > 1 and n_chunks % fuse:
        rollouts[1] = make_rollout(1)   # remainder chunks run unfused

    faces = np.asarray(statics.smplx_model.faces)
    even_seq, odd_seq = [], []
    even_smplx, odd_smplx = [], []
    n_full = n_chunks - n_chunks % fuse
    groups = [list(range(g, g + fuse)) for g in range(0, n_full, fuse)]
    groups += [[c] for c in range(n_full, n_chunks)]
    for group in groups:
        tgts = []
        for c in group:
            _, tgt_a, _ = dataset[idx_a[c]]
            _, tgt_b, _ = dataset[idx_b[c]]
            tgts.append(jx(_stack_batches(tgt_a, tgt_b)))
        tgt = tgts[0] if len(tgts) == 1 else _concat_frames(tgts)
        c = group[0]
        G = len(group)
        T_g = G * T_out
        if wav_feats is not None:
            base = 2 * c * T_out
            fa = wav_feats[base:base + 2 * T_g:2]         # even frames
            fb = wav_feats[base + 1:base + 2 * T_g:2]     # odd frames
            audio = jnp.asarray(np.stack([fa, fb]))
        else:
            audio = tgt.audio_features
        t0 = time.time()
        rendered, out_tri, out_smpl, pred = rollouts[G](
            state.params, triplanes, smpl_tokens, audio, tgt.cam_parms)
        if group is groups[0]:
            # fence: first-rollout wall time = compile (cold) or cache
            # restore (warm) + one execution
            float(rendered.mean())
            print(f"[demo] first rollout (compile/restore + exec): "
                  f"{time.time() - t0:.1f}s "
                  f"(cache: {os.environ.get('JAX_COMPILATION_CACHE_DIR')})")
            if prewarm:
                print("[demo] --prewarm: serving programs compiled into the "
                      "persistent cache; exiting")
                return None
        # sliding token window (main2.py:202-203; the fused program returns
        # the already-slid last-T_in window)
        triplanes = out_tri
        smpl_tokens = out_smpl

        # per-batch eval losses (main2.py:206-211), printed per sub-chunk
        gt = jnp.transpose(tgt.video, (0, 1, 3, 4, 2))
        for gi, cc in enumerate(group):
            sl_ = slice(gi * T_out, (gi + 1) * T_out)
            for b, name in ((0, "even"), (1, "odd")):
                l1 = float(L.l1_loss(rendered[b, sl_], gt[b, sl_]))
                parms_b = jax.tree_util.tree_map(
                    lambda v: v[b:b + 1, sl_], tgt.smpl_parms)
                pred_b = jax.tree_util.tree_map(
                    lambda v: v[b:b + 1, sl_], pred)
                sl = float(L.smplx_param_loss(pred_b, parms_b)[0])
                print(f"[demo] chunk {cc} {name}: L1={l1:.6f} SMPLX={sl:.6f}")

        # SMPLX mesh overlay on the rendered frames (main2.py:213-220)
        flat_pred = jax.tree_util.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:]), pred)
        verts = np.asarray(smplx_ops.forward(
            statics.smplx_model, flat_pred,
            flat_hand_mean=ac.flat_hand_mean)).reshape(2, T_g, -1, 3)

        # Sparse-upsampler cap saturation guard (diagnostic): estimate the
        # per-plane covered-tile count (same cell mapping + 3x3 halo as
        # select_tiles, from the base SMPLX verts — densified points stay
        # inside the dilation) and warn when the cap truncates the body.
        if ac.upsampler_sparse:
            res = ac.triplane_resolution * 2 ** ac.num_upsample_blocks
            grid = res // ac.upsampler_sparse_tile_px
            u = np.clip(verts / ac.radius, -1.0, 1.0)
            cell = np.clip(np.floor(
                (u + 1.0) * (grid / 2.0)
                - 0.5 / ac.upsampler_sparse_tile_px), 0, grid - 1)
            worst = 0
            for a0, a1 in ((0, 1), (0, 2), (1, 2)):
                cov = np.zeros((2 * T_g, grid + 2, grid + 2), bool)
                fi = np.repeat(np.arange(2 * T_g), verts.shape[2])
                cx = cell[..., a0].reshape(-1).astype(int)
                cy = cell[..., a1].reshape(-1).astype(int)
                for dr in range(3):
                    for dc in range(3):
                        cov[fi, cy + dr, cx + dc] = True
                worst = max(worst, int(cov.sum(axis=(1, 2)).max()))
            if worst > ac.upsampler_sparse_max_tiles:
                print(f"[demo] WARNING: body covers ~{worst} tiles > "
                      f"sparse cap {ac.upsampler_sparse_max_tiles} — "
                      f"low-priority halo tiles are being dropped; raise "
                      f"upsampler_sparse_max_tiles if artifacts appear")
        transl = np.asarray(pred["transl"]).reshape(2, T_g, 3)
        Ks = np.asarray(tgt.cam_parms["intrinsic"])
        Es = np.asarray(tgt.cam_parms["extrinsic"])
        rendered_np = np.asarray(rendered)
        for t in range(T_g):
            for b, (seq, sseq) in ((0, (even_seq, even_smplx)),
                                   (1, (odd_seq, odd_smplx))):
                frame = rendered_np[b, t]
                seq.append(frame)
                sseq.append(draw_smplx_on_image(
                    frame, verts[b, t], faces, Ks[b, t], Es[b, t],
                    transl=transl[b, t]))
        print(f"[demo] chunk {group[-1] + 1}/{n_chunks}")

    # interleave the streams (main2.py:322-331)
    combined, combined_smplx = [], []
    for i in range(len(even_seq)):
        combined.append(even_seq[i])
        combined_smplx.append(even_smplx[i])
        if i < len(odd_seq):
            combined.append(odd_seq[i])
            combined_smplx.append(odd_smplx[i])

    mux = audio_path if audio_path and os.path.exists(audio_path) else None
    out = output_path or os.path.join(out_dir, "original_sequence.mp4")
    write_frames(combined, os.path.join(out_dir, "frames"))
    write_mp4(combined, out, fps=fps, audio_path=mux)
    write_mp4(combined_smplx, os.path.join(out_dir, "smplx_sequence.mp4"),
              fps=fps, audio_path=mux)
    print(f"[demo] wrote {len(combined)} frames -> {out} (+smplx_sequence)")
    return out


def main(argv=None):
    args = parse_args(argv)
    from .configs import ConfigLoader
    cfg = ConfigLoader.load_config(args.config, args.overrides)

    # multi-host rendezvous BEFORE any jax device use (the TPU answer to
    # Lightning's DDP spawn, trainer_factory.py:29-46)
    from .parallel.distributed import maybe_initialize, apply_platform_env
    apply_platform_env()
    maybe_initialize(cfg)

    from .configs.build import default_affine_norm_for_import
    cfg = default_affine_norm_for_import(cfg, args.checkpoint)

    np.random.seed(int(cfg.get("seed", 42)))
    os.makedirs(cfg.training.output_dir, exist_ok=True)

    model, statics, ac = build_stage2(cfg)
    if args.mode == "demo":
        # inference-only: overlay the bench-measured serving knobs (sparse
        # final upsample level, segmented splat, no remat, unrolled frame
        # scan) unless the YAML names a knob explicitly. Pure compute-path
        # flags — the parameter tree is identical, so checkpoints restore
        # unchanged.
        from .configs.build import apply_serving_profile
        from .models.audio_avatar import AudioDrivenAvatar
        ac = apply_serving_profile(ac, cfg)
        model = AudioDrivenAvatar(cfg=ac,
                                  num_verts_encoder=model.num_verts_encoder,
                                  point_refiner=model.point_refiner)
    state = init_state2(model, statics, cfg, ac)

    if args.checkpoint and os.path.isdir(args.checkpoint):
        from .training.checkpoints import CheckpointManager
        state, ok = CheckpointManager(args.checkpoint).restore(state)
        print(f"[main2] checkpoint restore: {'ok' if ok else 'none found'}")
    elif args.checkpoint:
        # a FILE is the released full reference .ckpt (triplane_gaussian.*
        # + audio_triplane.*, reference main2.py:127-138): non-strict
        # torch import of every structurally-identical module
        from .training.torch_import import (import_reference_checkpoint,
                                            merge_into)
        partial, report = import_reference_checkpoint(args.checkpoint, ac,
                                                      stage=2)
        merged, mismatches = merge_into(state.params, partial)
        state = state.replace(params=merged)
        print(f"[main2] torch import: {report['loaded']} tensors from "
              f"{report['total_torch_modules']} torch modules; "
              f"skipped={sorted(report['skipped_modules'])[:8]}"
              f"{'...' if len(report['skipped_modules']) > 8 else ''}; "
              f"mismatches={mismatches[:8]}")

    if args.mode == "train":
        from .data.factory import DatasetFactory
        from .parallel.collectives import cache_sync
        from .training.stage2 import Stage2TrainLoop
        train_data = DatasetFactory.create_dataloader(cfg, split="train")
        loop = Stage2TrainLoop(
            model, statics, ac,
            replacement_prob=float(cfg.training.get("cache_replacement_prob", 0.0)),
            cache_sync=cache_sync)
        fast = bool(cfg.training.get("fast_dev_run"))
        max_epochs = 1 if fast else int(cfg.training.max_epochs)
        ckpt_mgr = None
        if not fast:
            from .training.checkpoints import CheckpointManager
            ckpt_mgr = CheckpointManager(
                os.path.join(cfg.training.output_dir, "checkpoints"),
                max_to_keep=int(cfg.training.get("validation", {}).get("save_top_k", 3)))
            if args.resume:
                state, ok = ckpt_mgr.restore(state)
                print(f"[main2] resume: {'ok' if ok else 'no checkpoint'}")
        import jax, jax.numpy as jnp
        from .training.stage2 import cache_depth_channels
        from .training.trainer import MetricLogger, save_comparison_image
        # observability parity with the reference's stage-2 training_step
        # (lightning_model_wrapper.py:498-570): TB scalars, per-cache-depth
        # l1 channels (NaN-filled), and audio-rendered comparison dumps
        out_dir = cfg.training.output_dir
        logger = MetricLogger(
            os.path.join(out_dir, "tb"),
            use_wandb=bool(cfg.training.get("logging", {}).get("use_wandb",
                                                               False)))
        log_every = int(cfg.training.get("logging", {})
                        .get("log_every_n_steps", 10))
        image_every = 1 if fast else 200  # reference dumps every 200 (:536)
        jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
        step = 0
        for epoch in range(max_epochs):
            for ref, tgt, bid in train_data:
                state, metrics = loop.run_step(state, jx(ref), jx(tgt), bid)
                depth = int(metrics.pop("cache_iter"))
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics.update(cache_depth_channels(metrics["l1_target"],
                                                    depth))
                if step % log_every == 0:
                    logger.log(step, metrics, "train")
                    print(f"[e{epoch} s{step}] " +
                          " ".join(f"{k}={v:.4f}"
                                   for k, v in metrics.items()
                                   if not np.isnan(v)))
                if step % image_every == 0:
                    tgt_hwc = np.transpose(np.asarray(tgt.video[0]),
                                           (0, 2, 3, 1))
                    save_comparison_image(
                        os.path.join(out_dir, "audio_rendered_images",
                                     f"audio_comparison_{step}_iter{depth}.png"),
                        np.asarray(loop.last_rendered[0]), tgt_hwc)
                    if loop.last_ref_rendered is not None:
                        ref_hwc = np.transpose(np.asarray(ref.video[0]),
                                               (0, 2, 3, 1))
                        save_comparison_image(
                            os.path.join(out_dir, "audio_rendered_images",
                                         f"ref_comparison_{step}.png"),
                            np.asarray(loop.last_ref_rendered[0]), ref_hwc)
                step += 1
                if fast:
                    break
            if ckpt_mgr is not None:
                ckpt_mgr.save(step, state)
            if fast:
                break
        logger.close()
        print("[main2] training done")
    elif args.mode == "demo":
        run_demo(cfg, model, statics, ac, state, args.audio, args.output,
                 prewarm=args.prewarm)
    else:  # test
        from .data.factory import DatasetFactory
        from .training.stage2 import make_predict_step
        data = DatasetFactory.create_dataloader(cfg, split="val")
        pred = make_predict_step(model, statics, ac)
        import jax, jax.numpy as jnp
        jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
        from .utils import losses as L
        from .training.trainer import save_comparison_image
        out_dir = os.path.join(cfg.training.output_dir, "predict_results")
        tot, n = 0.0, 0
        for ref, tgt, bid in data:
            ref, tgt = jx(ref), jx(tgt)
            rendered, _, _ = pred(state.params, ref, tgt)
            tot += float(L.l1_loss(rendered,
                                   jnp.transpose(tgt.video, (0, 1, 3, 4, 2))))
            if n < 4:  # prediction comparison dumps (predict_step :607-623)
                import numpy as _np
                save_comparison_image(
                    os.path.join(out_dir, f"audio_comparison_{n}.png"),
                    _np.asarray(rendered[0]),
                    _np.asarray(jnp.transpose(tgt.video, (0, 1, 3, 4, 2))[0]))
            n += 1
        print(f"[main2] test l1={tot / max(n, 1):.5f} over {n} batches")


if __name__ == "__main__":
    main()
