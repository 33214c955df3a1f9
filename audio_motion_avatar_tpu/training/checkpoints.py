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
    """Thin orbax wrapper saving {params-sans-frozen, opt_state, step}."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
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
