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


def run_demo(cfg, model, statics, ac, state, audio_path, output_path):
    """Autoregressive demo rollout on synthetic (or real) inputs."""
    import jax
    import jax.numpy as jnp
    from .data.synthetic import make_batch
    from .models.audio_encoder import AudioFeatureExtractor, resample_linear, SAMPLE_RATE
    from .utils.video import write_mp4, write_frames

    H, W = ac.image_size
    T_in = ac.triplane_input_frames
    T_out = ac.triplane_output_frames
    fps = int(cfg.dataset.get("frame_rate", 24))

    # --- audio features ---
    extractor = AudioFeatureExtractor(
        model_path=cfg.dataset.get("wav2vec2_model_path"),
        dim=ac.audio_feature_dim)
    if audio_path and os.path.exists(audio_path):
        import wave
        with wave.open(audio_path, "rb") as wf:
            sr = wf.getframerate()
            raw = np.frombuffer(wf.readframes(wf.getnframes()), np.int16)
            if wf.getnchannels() > 1:
                raw = raw.reshape(-1, wf.getnchannels()).mean(-1)
            wav = resample_linear(raw.astype(np.float32) / 32768.0, sr)
    else:
        t = np.arange(2 * SAMPLE_RATE) / SAMPLE_RATE
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    num_frames = int(len(wav) / SAMPLE_RATE * fps)
    num_frames = max(T_out, (num_frames // T_out) * T_out)
    audio_feats = extractor.features_per_video_frame(wav, num_frames, fps)

    # --- init token state from a stage-1 pass on reference frames ---
    ref = make_batch(1, T_in, (H, W), seed=0,
                     num_expr=ac.num_expression_coeffs)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
    ref = jx(ref)

    # encode via the stage-1 submodule directly
    @jax.jit
    def stage1_tokens(params, video, smpl, cam):
        out = model.apply(
            {"params": params}, statics, video, smpl, cam,
            method=lambda m, s, v, sp, c: m.triplane_gaussian(s, v, sp, c,
                                                              render=False))
        return out.triplane_tokens, out.smpl_tokens

    triplanes, smpl_tokens = stage1_tokens(state.params, ref.video,
                                           ref.smpl_parms, ref.cam_parms)

    # --- rollout chunks ---
    from .data.synthetic import orbit_camera
    K, E = orbit_camera(0.0, image_size=(H, W), focal=max(H, W) * 1.2)
    cam_chunk = {
        "intrinsic": jnp.tile(jnp.asarray(K)[None, None], (1, T_out, 1, 1)),
        "extrinsic": jnp.tile(jnp.asarray(E)[None, None], (1, T_out, 1, 1)),
    }

    @jax.jit
    def rollout(params, triplanes, smpl_tokens, audio_chunk):
        def m(mdl, tri, smpl, audio):
            out_tri, out_smpl = mdl.audio_triplane(audio, tri, smpl)
            B, T = out_smpl.shape[:2]
            flat = out_smpl.reshape((B * T,) + out_smpl.shape[2:])
            from .models.triplane_encoder import reshape_params
            pred = reshape_params(mdl.triplane_gaussian.encoder.smpl_decoder(flat),
                                  (B, T))
            rendered, _ = mdl.triplane_gaussian.renderer(statics, out_tri,
                                                         cam_chunk, pred)
            return rendered, out_tri, out_smpl

        return model.apply({"params": params}, triplanes, smpl_tokens,
                           audio_chunk, method=m)

    frames = []
    n_chunks = num_frames // T_out
    for c in range(n_chunks):
        chunk = jnp.asarray(audio_feats[None, c * T_out:(c + 1) * T_out])
        rendered, out_tri, out_smpl = rollout(state.params, triplanes,
                                              smpl_tokens, chunk)
        # slide the window: last T_in predicted frames become the next state
        triplanes = out_tri[:, -T_in:]
        smpl_tokens = out_smpl[:, -T_in:]
        frames.extend(np.asarray(rendered[0]))
        print(f"[demo] chunk {c + 1}/{n_chunks}")

    out = output_path or os.path.join(cfg.training.output_dir, "demo.mp4")
    write_frames(frames, os.path.join(cfg.training.output_dir, "demo_frames"))
    write_mp4(frames, out, fps=fps,
              audio_path=audio_path if audio_path and os.path.exists(audio_path) else None)
    print(f"[demo] wrote {len(frames)} frames -> {out}")
    return out


def main(argv=None):
    args = parse_args(argv)
    from .configs import ConfigLoader
    cfg = ConfigLoader.load_config(args.config, args.overrides)
    np.random.seed(int(cfg.get("seed", 42)))
    os.makedirs(cfg.training.output_dir, exist_ok=True)

    model, statics, ac = build_stage2(cfg)
    state = init_state2(model, statics, cfg, ac)

    if args.checkpoint and os.path.isdir(args.checkpoint):
        from .training.checkpoints import CheckpointManager
        state, ok = CheckpointManager(args.checkpoint).restore(state)
        print(f"[main2] checkpoint restore: {'ok' if ok else 'none found'}")

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
        jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
        step = 0
        for epoch in range(max_epochs):
            for ref, tgt, bid in train_data:
                state, metrics = loop.run_step(state, jx(ref), jx(tgt), bid)
                if step % 10 == 0:
                    print(f"[e{epoch} s{step}] " +
                          " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
                step += 1
                if fast:
                    break
            if ckpt_mgr is not None:
                ckpt_mgr.save(step, state)
            if fast:
                break
        print("[main2] training done")
    elif args.mode == "demo":
        run_demo(cfg, model, statics, ac, state, args.audio, args.output)
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
