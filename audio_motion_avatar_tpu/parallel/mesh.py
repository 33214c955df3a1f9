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


def param_shardings(mesh: Mesh, abstract_vars) -> dict:
    """Shardings for a variables pytree whose leaves may carry flax logical
    axis metadata (nn.with_logical_partitioning)."""
    logical = nn.get_partition_spec(abstract_vars)
    concrete = nn.logical_to_mesh(logical, LOGICAL_RULES)

    def to_sharding(spec):
        if not isinstance(spec, P):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(
        to_sharding, concrete,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def batch_sharding(mesh: Mesh):
    """Leading-axis data-parallel sharding for a batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def unbox(variables):
    """Strip flax Partitioned metadata boxes -> plain arrays."""
    return nn.meta.unbox(variables)
