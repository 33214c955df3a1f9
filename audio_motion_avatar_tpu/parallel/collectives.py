"""Host-side cross-process sync utilities.

The reference's single explicit collective is the stage-2 prediction-cache
all-gather (reference: src/models/lightning_model_wrapper.py:481-493,
dist.all_gather_object over NCCL). The TPU-native analog: device gradients
already sync via XLA collectives emitted from shardings; only this SMALL
HOST OBJECT needs process-level exchange, which is what
jax.experimental.multihost_utils provides. Single-process it degrades to
identity.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def all_gather_host_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per process -> list of all processes'.

    Single process: [obj]. Multi-process: byte-level gather via
    multihost_utils (fixed-size padded buffers, like torch's
    all_gather_object wire format).
    """
    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # Exchange sizes, pad to the max, gather.
    size = np.asarray([payload.size], np.int32)
    all_sizes = multihost_utils.process_allgather(size)  # (P, 1)
    max_size = int(all_sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # (P, max_size)
    out = []
    for i in range(gathered.shape[0]):
        n = int(all_sizes[i, 0])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def cache_sync(new_item: dict) -> List[dict]:
    """The stage-2 cache exchange: each process contributes <=1 new cache
    entry per step; everyone merges everyone's."""
    return all_gather_host_objects(new_item or {})
