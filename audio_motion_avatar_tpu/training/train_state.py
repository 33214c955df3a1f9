"""Optimizer + train state.

Reference training config (src/configs/training/train_stage{1,2}.yaml +
trainer_factory.py:44-45, lightning_model_wrapper.py:366-382):
Adam, LinearLR 1.0 -> end_factor over total_steps stepped per iteration,
global-norm gradient clipping (default 1.0), gradient accumulation via
optax.MultiSteps (Lightning accumulate_grad_batches analog).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 5e-5
    total_steps: int = 50000
    end_factor: float = 0.01
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    accumulate_steps: int = 1
    # Linear LR warmup over the first N steps (0 = reference-faithful: the
    # reference's LinearLR starts at full lr, train_stage1.yaml scheduler).
    # The zero-init gaussian-attribute heads sit on large un-normalized
    # triplane features, so a full-lr first Adam step moves their logits by
    # O(lr * sum|feat|) coherently — measured slamming the opacity logit
    # past sigmoid saturation in ONE step at lr 2e-4 (all-white render,
    # dead photometric gradient; tools/overfit_debug.py 2026-08-19).
    warmup_steps: int = 0
    # Failure containment the reference lacks (SURVEY §5 "no sanitizers"):
    # skip updates whose grads are non-finite instead of poisoning params.
    nan_guard: bool = True
    nan_guard_max_consecutive: int = 10


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    decay = optax.linear_schedule(
        init_value=cfg.learning_rate,
        end_value=cfg.learning_rate * cfg.end_factor,
        transition_steps=cfg.total_steps - cfg.warmup_steps,
    )
    if cfg.warmup_steps > 0:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate,
                                   cfg.warmup_steps), decay],
            boundaries=[cfg.warmup_steps])
    else:
        schedule = decay
    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                                 weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1]))
    tx = optax.chain(*chain)
    if cfg.nan_guard:
        tx = optax.apply_if_finite(tx, cfg.nan_guard_max_consecutive)
    if cfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_steps)
    return tx


# Param subtrees that never train. The reference freezes Sapiens via
# requires_grad=False, and torch Adam lazily allocates state only for params
# WITH grads — so the 1B frozen encoder carries no optimizer state there.
# Without this split, Adam moments for the frozen ViT alone are ~10GB fp32 —
# measured OOM (19.9G of 15.75G hbm) on the full-scale stage-1 step.
FROZEN_PREFIXES = ("sapiens_encoder",)


def _is_frozen(path_keys, prefixes=FROZEN_PREFIXES) -> bool:
    return any(p in path_keys for p in prefixes)


def split_frozen(params, prefixes=FROZEN_PREFIXES):
    """params -> (trainable, frozen) dicts (flax flatten/unflatten)."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if not _is_frozen(k, prefixes)}
    frozen = {k: v for k, v in flat.items() if _is_frozen(k, prefixes)}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_frozen(trainable, frozen):
    from flax import traverse_util
    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any          # optimizer state over the TRAINABLE subtree only
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        g_train, _ = split_frozen(grads)
        p_train, p_frozen = split_frozen(self.params)
        updates, new_opt = self.tx.update(g_train, self.opt_state, p_train)
        new_train = optax.apply_updates(p_train, updates)
        return self.replace(step=self.step + 1,
                            params=merge_frozen(new_train, p_frozen),
                            opt_state=new_opt)

    @classmethod
    def create(cls, params, tx):
        p_train, _ = split_frozen(params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(p_train), tx=tx)
