"""Training orchestration — the TrainerFactory + Lightning-loop equivalent.

Covers what the reference gets from L.Trainer (reference:
src/utils/trainer_factory.py): epoch loop, gradient accumulation (inside the
optimizer via optax.MultiSteps), grad clipping, periodic validation,
ModelCheckpoint behavior (monitor metric, save_top_k, save_last), LR/metric
logging (TensorBoard), fast_dev_run smoke mode, periodic side-by-side image
dumps (lightning_model_wrapper.py:168-215), and the data/model device mesh.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as pmesh
from .checkpoints import CheckpointManager


def jaxify(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


class MetricLogger:
    """TensorBoard (default) or wandb scalars, rank-0 only
    (trainer_factory.py:50-70 logger selection)."""

    def __init__(self, log_dir: str, use_tb: bool = True, use_wandb: bool = False,
                 wandb_project: str = "audio_motion_avatar",
                 wandb_run_name: Optional[str] = None):
        self.writer = None
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(project=wandb_project, name=wandb_run_name,
                           dir=log_dir)
            except Exception as e:  # wandb absent / offline
                print(f"[logger] wandb unavailable ({e}); falling back to TB")
        if self.wandb is None and use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        scalars = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)
        elif self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.wandb is not None:
            self.wandb.finish()


def save_comparison_image(path: str, rendered: np.ndarray, target: np.ndarray):
    """Side-by-side (rendered | target) PNG per frame, stacked vertically
    (the reference's comparison dumps, lightning_model_wrapper.py:173-215)."""
    from PIL import Image
    frames = []
    T = rendered.shape[0]
    for t in range(T):
        row = np.concatenate([rendered[t], target[t]], axis=1)
        frames.append(row)
    img = np.clip(np.concatenate(frames, axis=0) * 255, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


class Trainer:
    def __init__(self, cfg, train_step: Callable, eval_step: Optional[Callable],
                 output_dir: Optional[str] = None,
                 render_fn: Optional[Callable] = None,
                 param_specs=None):
        """render_fn(params, ref_batch) -> (rendered (B,T,H,W,3), target
        (B,T,H,W,3)) used for the periodic side-by-side dumps
        (lightning_model_wrapper.py:168-169).

        param_specs: the params' logical PartitionSpec tree (from
        init_state(return_specs=True)); with a 'model' mesh axis > 1 the
        annotated weights (transformer heads/mlp) are sharded over it —
        tensor parallelism. Without it, params replicate (pure DP)."""
        t = cfg.training
        self.cfg = cfg
        self.train_step = train_step
        self.eval_step = eval_step
        self.render_fn = render_fn
        self.max_epochs = int(t.get("max_epochs", 1))
        self.fast_dev_run = bool(t.get("fast_dev_run", False))
        self.log_every = int(t.get("logging", {}).get("log_every_n_steps", 10))
        self.monitor = t.get("validation", {}).get("monitor", "val/loss_total")
        self.save_top_k = int(t.get("validation", {}).get("save_top_k", 1))
        self.val_every = int(t.get("validation", {}).get("val_every_n_epoch", 1))
        self.image_every = 500

        self.output_dir = output_dir or t.get("output_dir", "outputs")
        os.makedirs(self.output_dir, exist_ok=True)
        log_cfg = t.get("logging", {})
        self.logger = MetricLogger(os.path.join(self.output_dir, "tb"),
                                   use_tb=not self.fast_dev_run,
                                   use_wandb=bool(log_cfg.get("use_wandb", False)),
                                   wandb_project=log_cfg.get("wandb_project",
                                                             "audio_motion_avatar"),
                                   wandb_run_name=log_cfg.get("wandb_run_name"))
        self.ckpt = None
        if not self.fast_dev_run:
            self.ckpt = CheckpointManager(
                os.path.join(self.output_dir, "checkpoints"),
                max_to_keep=self.save_top_k, monitor=self.monitor)
        self.best_metric = float("inf")

        # LR schedule mirror for logging (the reference's LearningRateMonitor,
        # trainer_factory.py:106). MultiSteps advances the inner schedule once
        # per accumulated optimizer step.
        from ..configs.build import build_optim_config
        import optax
        oc = build_optim_config(cfg)
        self._lr_accum = max(1, oc.accumulate_steps)
        self._lr_schedule = optax.linear_schedule(
            init_value=oc.learning_rate,
            end_value=oc.learning_rate * oc.end_factor,
            transition_steps=oc.total_steps)

        # Device mesh: data x model ('auto DDP' analog, trainer_factory.py:29-46).
        n_data = int(t.get("devices", 1))
        n_model = int(t.get("model_parallel", 1))
        n_need = n_data * n_model
        avail = len(jax.devices())
        if n_need > avail:
            n_data, n_model = avail, 1
        self.mesh = pmesh.make_mesh(num_data=n_data, num_model=n_model,
                                    devices=jax.devices()[: n_data * n_model])
        self.param_specs = param_specs

    def fit(self, state, train_data: Iterable, val_data: Optional[Iterable] = None,
            resume: bool = False):
        if resume and self.ckpt is not None:
            state, ok = self.ckpt.restore(state)
            if ok:
                print(f"[trainer] resumed at step {int(state.step)}")

        global_step = int(state.step)
        with jax.set_mesh(self.mesh):
            if self.param_specs is not None:
                state = jax.device_put(
                    state, pmesh.state_shardings(self.mesh, state,
                                                 self.param_specs))
            else:
                state = jax.device_put(state, pmesh.replicated(self.mesh))
            for epoch in range(self.max_epochs):
                for batch in train_data:
                    ref, test, _bid = batch
                    ref = jax.device_put(jaxify(ref), pmesh.batch_sharding(self.mesh))
                    test = jax.device_put(jaxify(test), pmesh.batch_sharding(self.mesh))
                    t0 = time.time()
                    state, metrics = self.train_step(state, ref, test)
                    if global_step % self.log_every == 0:
                        metrics = {k: float(v) for k, v in metrics.items()}
                        metrics["step_time_s"] = time.time() - t0
                        metrics["lr"] = float(
                            self._lr_schedule(global_step // self._lr_accum))
                        self.logger.log(global_step, metrics, "train")
                        print(f"[e{epoch} s{global_step}] " +
                              " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
                    if (self.render_fn is not None
                            and global_step % self.image_every == 0):
                        rendered, target = self.render_fn(state.params, ref)
                        save_comparison_image(
                            os.path.join(self.output_dir, "train_images",
                                         f"comparison_{global_step}.png"),
                            np.asarray(rendered[0]), np.asarray(target[0]))
                    global_step += 1
                    if self.fast_dev_run:
                        break

                if val_data is not None and (epoch + 1) % self.val_every == 0:
                    val_metrics = self.validate(state, val_data)
                    self.logger.log(global_step, val_metrics, "val")
                    self._maybe_checkpoint(state, global_step, val_metrics)
                elif self.ckpt is not None:
                    self.ckpt.save(global_step, state)
                if self.fast_dev_run:
                    break
        self.logger.close()
        return state

    def validate(self, state, val_data, save_images: bool = False) -> dict:
        if self.eval_step is None:
            return {}
        agg, n = {}, 0
        for batch in val_data:
            ref, test, _ = batch
            ref = jaxify(ref)
            m = self.eval_step(state.params, ref, jaxify(test))
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            if save_images and self.render_fn is not None:
                # reference test_step comparison dumps
                # (lightning_model_wrapper.py:283,291-333)
                rendered, target = self.render_fn(state.params, ref)
                save_comparison_image(
                    os.path.join(self.output_dir, "test_images",
                                 f"triplane_comparison_{n}.png"),
                    np.asarray(rendered[0]), np.asarray(target[0]))
            n += 1
            if self.fast_dev_run:
                break
        out = {k: v / max(n, 1) for k, v in agg.items()}
        out["loss_total"] = out.get("loss", 0.0)
        return out

    def _maybe_checkpoint(self, state, step: int, val_metrics: dict):
        if self.ckpt is None:
            return
        key = self.monitor.split("/")[-1]
        cur = val_metrics.get(key, val_metrics.get("loss_total", 0.0))
        self.ckpt.save(step, state, metrics={key: cur})
        if cur < self.best_metric:
            self.best_metric = cur
