"""Device mesh + sharding rules.

The TPU-native replacement for the reference's distributed story (Lightning
DDP over NCCL, SURVEY.md §2.2): a ('data', 'model') jax.sharding.Mesh with
  * batch sharded over 'data' (pure DP — the only strategy the reference
    has, trainer_factory.py:29-46);
  * optional tensor parallelism over 'model': the transformer stack's
    logical axes ('heads', 'mlp') shard attention heads and MLP hidden dims
    (see models/transformer.py), everything else replicates.
Gradient all-reduce is emitted by XLA from the sharding annotations — no
explicit NCCL-style collectives, and the same program runs over ICI within a
slice or DCN across slices.

Works on any backend: real TPUs, or the CPU host platform with
--xla_force_host_platform_device_count for multi-chip simulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import flax.linen as nn

# flax logical axis -> mesh axis
LOGICAL_RULES = (
    ("batch", "data"),
    ("heads", "model"),
    ("mlp", "model"),
    ("conv_out", "model"),
    ("embed", None),
    ("embed_inner", None),
)


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, (num_data, num_model, n)
    dev_array = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def logical_specs(boxed_variables):
    """Boxed (nn.with_logical_partitioning) variables -> logical
    PartitionSpec pytree. Call BEFORE unbox() — unboxing drops the axis
    metadata."""
    return nn.get_partition_spec(boxed_variables)


def to_named_shardings(mesh: Mesh, logical):
    """Logical PartitionSpec pytree -> NamedShardings via LOGICAL_RULES."""
    concrete = nn.logical_to_mesh(logical, LOGICAL_RULES)

    def to_sharding(spec):
        if not isinstance(spec, P):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(
        to_sharding, concrete,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def param_shardings(mesh: Mesh, abstract_vars) -> dict:
    """Shardings for a variables pytree whose leaves may carry flax logical
    axis metadata (nn.with_logical_partitioning)."""
    return to_named_shardings(mesh, logical_specs(abstract_vars))


def shard_like_params(params_shardings, tree):
    """Shardings for an arbitrary pytree (e.g. an optax state): any subtree
    structurally identical to the params tree (Adam mu/nu, MultiSteps
    acc_grads) inherits the params shardings; every other leaf replicates.

    The params shardings carry the mesh, so replication uses the same mesh.
    """
    pdef = jax.tree_util.tree_structure(params_shardings)
    some_sharding = jax.tree_util.tree_leaves(params_shardings)[0]
    repl = NamedSharding(some_sharding.mesh, P())

    def is_params_subtree(x):
        return jax.tree_util.tree_structure(x) == pdef

    def leaf_sharding(x):
        return params_shardings if is_params_subtree(x) else repl

    return jax.tree_util.tree_map(leaf_sharding, tree,
                                  is_leaf=is_params_subtree)


def state_shardings(mesh: Mesh, state, params_logical):
    """TrainState-shaped sharding tree: params by their logical axes
    (tensor parallelism over 'model'), optimizer moments like the params,
    counters/step replicated.

    Optimizer state covers only the TRAINABLE subtree (train_state
    split_frozen excludes the frozen encoder from Adam state), so the
    moment matcher uses the trainable shard tree, not the full params."""
    from ..training.train_state import split_frozen
    psh = to_named_shardings(mesh, params_logical)
    psh_train, _ = split_frozen(psh)
    return state.replace(step=replicated(mesh), params=psh,
                         opt_state=shard_like_params(psh_train,
                                                     state.opt_state))


def batch_sharding(mesh: Mesh):
    """Leading-axis data-parallel sharding for a batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def unbox(variables):
    """Strip flax Partitioned metadata boxes -> plain arrays."""
    return nn.meta.unbox(variables)
