"""Stage-1 CLI — train / test / predict the human-representation model.

Interface parity with the reference entry (reference: src/main.py):
  python -m audio_motion_avatar_tpu.main --config <yaml> --mode train|test|predict \
      [--checkpoint ckpt] [--resume] [overrides a.b=c ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Stage 1: triplane avatar reconstruction")
    p.add_argument("--config", type=str,
                   default=os.path.join(os.path.dirname(__file__), "configs",
                                        "config_stage_1.yaml"))
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "test", "predict"])
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("overrides", nargs="*", help="dotted config overrides a.b=c")
    return p.parse_args(argv)


def setup_output_dirs(cfg):
    out = cfg.training.output_dir
    for sub in ("checkpoints", "train_images", "test_images", "target_images"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    import yaml
    with open(os.path.join(out, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    return out


def build_everything(cfg):
    """Config -> (model, statics, avatar_cfg). Shared with main2."""
    import jax
    from .configs.build import build_avatar_config
    from .models.avatar import TriplaneGaussianAvatar
    from .models.renderer import build_renderer_statics
    from .ops import smplx as smplx_ops

    ac = build_avatar_config(cfg)
    smplx_path = ac.smplx_model_path
    if smplx_path and os.path.exists(str(smplx_path)):
        smplx_model = smplx_ops.load_model(str(smplx_path),
                                           num_expr=ac.num_expression_coeffs)
    else:
        nv = 400 if cfg.get("profile") == "tiny" else smplx_ops.SMPLX_NUM_VERTS
        smplx_model = smplx_ops.synthetic_model(seed=0, num_verts=nv)
        print("[main] SMPLX asset not found -> synthetic body model "
              f"({nv} verts). Set model.triplane_net.smplx_model_path for parity.")

    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=ac.subdivide_steps,
                                     densify=ac.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])

    point_refiner = None
    if not ac.no_point_refiner:
        from .models.ptv3 import build_point_refiner
        point_refiner = build_point_refiner(ac)

    model = TriplaneGaussianAvatar(cfg=ac, num_verts_encoder=nverts_enc,
                                   point_refiner=point_refiner)
    return model, statics, ac


def init_state(model, statics, cfg, ac, seed=0, return_specs=False):
    """-> TrainState (and, with return_specs, the params' logical
    PartitionSpec tree for tensor-parallel placement)."""
    import jax
    import jax.numpy as jnp
    from .configs.build import build_optim_config
    from .parallel.mesh import logical_specs, unbox
    from .data.synthetic import make_batch
    from .training.train_state import TrainState, make_optimizer

    H, W = ac.image_size
    b = make_batch(1, 1, (H, W), seed=seed, num_expr=ac.num_expression_coeffs)
    variables = model.init(jax.random.PRNGKey(seed), statics,
                           jnp.asarray(b.video), b.smpl_parms,
                           {k: jnp.asarray(v) for k, v in b.cam_parms.items()})
    specs = logical_specs(variables)["params"]
    params = unbox(variables)["params"]
    tx = make_optimizer(build_optim_config(cfg))
    state = TrainState.create(params, tx)
    return (state, specs) if return_specs else state


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

    seed = int(cfg.get("seed", 42))
    np.random.seed(seed)
    setup_output_dirs(cfg)

    model, statics, ac = build_everything(cfg)
    state, param_specs = init_state(model, statics, cfg, ac, seed=seed,
                                    return_specs=True)

    from .data.factory import DatasetFactory
    train_data = DatasetFactory.create_dataloader(cfg, split="train")
    val_data = DatasetFactory.create_dataloader(cfg, split="val")

    from .training import stage1
    from .training.trainer import Trainer
    train_step = stage1.make_train_step(model, statics, ac)
    eval_step = stage1.make_eval_step(model, statics, ac)
    render_fn = stage1.make_render_fn(model, statics)
    trainer = Trainer(cfg, train_step, eval_step, render_fn=render_fn,
                      param_specs=param_specs)

    if args.checkpoint:
        if os.path.isdir(args.checkpoint):
            from .training.checkpoints import CheckpointManager
            state, ok = CheckpointManager(args.checkpoint).restore(state)
            print(f"[main] checkpoint restore: {'ok' if ok else 'none found'}")
        else:
            # a FILE is a reference torch/Lightning .ckpt (main.py:99-107):
            # non-strict import of every structurally-identical module
            from .training.torch_import import (import_reference_checkpoint,
                                                merge_into)
            partial, report = import_reference_checkpoint(args.checkpoint,
                                                          ac, stage=1)
            merged, mismatches = merge_into(state.params, partial)
            state = state.replace(params=merged)
            print(f"[main] torch import: {report['loaded']} tensors from "
                  f"{report['total_torch_modules']} torch modules; "
                  f"skipped={sorted(report['skipped_modules'])[:8]}"
                  f"{'...' if len(report['skipped_modules']) > 8 else ''}; "
                  f"mismatches={mismatches[:8]}")

    if args.mode == "train":
        trainer.fit(state, train_data, val_data, resume=args.resume)
    elif args.mode in ("test", "predict"):
        metrics = trainer.validate(state, val_data or train_data,
                                   save_images=True)
        print("[main] eval:", {k: round(v, 5) for k, v in metrics.items()})
    print("[main] done.")


if __name__ == "__main__":
    main()
