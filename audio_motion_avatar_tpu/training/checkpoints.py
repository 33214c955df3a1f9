"""Checkpointing: orbax save/restore with frozen-encoder exclusion, plus
PyTorch-checkpoint import for the released reference weights.

Mirrors the reference's checkpoint semantics:
  * frozen Sapiens weights are STRIPPED from every checkpoint
    (on_save_checkpoint, lightning_model_wrapper.py:75-80 and :411-416);
  * resume is prefix-remapped, filtered, non-strict weight surgery
    (main.py:99-107,114-127; main2.py:100-104,123-138) — import_torch_ckpt
    reproduces that mapping for `triplane_gaussian.*` / `audio_triplane.*`
    keys;
  * ModelCheckpoint-style top-k + last tracking lives in the Trainer.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

FROZEN_PREFIXES = ("sapiens_encoder",)


def split_frozen(params: dict):
    """(trainable, frozen) partitions by top-level module name."""
    train = {k: v for k, v in params.items() if k not in FROZEN_PREFIXES}
    frozen = {k: v for k, v in params.items() if k in FROZEN_PREFIXES}
    return train, frozen


def merge_frozen(train: dict, frozen: dict) -> dict:
    out = dict(train)
    out.update(frozen)
    return out


class CheckpointManager:
    """Orbax wrapper saving {params-sans-frozen, opt_state, step}.

    Retention reproduces Lightning ModelCheckpoint (reference:
    trainer_factory.py:81-103): when `monitor` is set, the k BEST checkpoints
    by the monitored metric are kept (`mode` 'min'/'max') plus always the
    most recent one (save_last=True analog); the worst-by-metric is evicted,
    not the oldest. Metric-less saves fall back to keep-latest-k (FIFO).
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 monitor: Optional[str] = None, mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.monitor = monitor.split("/")[-1] if monitor else None
        self.mode = mode
        self._metric_history: dict = {}  # step -> monitored value (or None)
        # eviction is managed here (metric-ranked), not by orbax (age-ranked)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None,
                                                 create=True),
        )

    def save(self, step: int, state, metrics: Optional[dict] = None):
        train_params, _ = split_frozen(state.params)
        payload = {
            "params": train_params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload),
                       metrics={k: float(v) for k, v in (metrics or {}).items()})
        self._mgr.wait_until_finished()
        cur = None
        if self.monitor and metrics and self.monitor in metrics:
            cur = float(metrics[self.monitor])
        self._metric_history[step] = cur
        self._evict()

    def _evict(self):
        steps = sorted(s for s in self._mgr.all_steps())
        if len(steps) <= self.max_to_keep:
            return
        latest = steps[-1]
        scored = [(s, self._metric_history.get(s)) for s in steps]
        with_metric = [(s, v) for s, v in scored if v is not None]
        if with_metric and self.monitor:
            sign = 1.0 if self.mode == "min" else -1.0
            ranked = sorted(with_metric, key=lambda sv: sign * sv[1])
            keep = {s for s, _ in ranked[: self.max_to_keep]}
        else:  # FIFO fallback (no metrics ever supplied)
            keep = set(steps[-self.max_to_keep:])
        keep.add(latest)  # save_last=True
        for s in steps:
            if s not in keep:
                self._mgr.delete(s)
                self._metric_history.pop(s, None)
        self._mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing state (frozen params kept from `state`)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, False
        train_params, frozen = split_frozen(state.params)
        template = {
            "params": train_params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        # Normalize leaves to shape/dtype templates: live states can carry
        # jax literal leaves (e.g. constant-folded zero-init biases) that
        # orbax's StandardRestore input check rejects (TypedNdArray).
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            template)
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        params = merge_frozen(restored["params"], frozen)
        return state.replace(params=params, opt_state=restored["opt_state"],
                             step=jax.numpy.asarray(restored["step"])), True

    def latest_step(self):
        return self._mgr.latest_step()


# ---------------------------------------------------------------------------
# PyTorch checkpoint import (released reference weights)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict:
    """Load a Lightning .ckpt / torch .pt state dict as numpy arrays."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def import_torch_ckpt(state_dict: dict, strip_prefixes=("triplane_gaussian.",),
                      drop_substrings=("sapiens_encoder", "image_feature")) -> dict:
    """Prefix-remap + filter, reproducing the reference's manual weight
    surgery (main.py:99-107). Returns a flat {remapped_name: ndarray} dict;
    mapping into flax module trees is model-specific and done by the caller
    (see docs/WEIGHT_IMPORT.md once the layer-name map lands)."""
    out = {}
    for k, v in state_dict.items():
        if any(s in k for s in drop_substrings):
            continue
        for p in strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out
