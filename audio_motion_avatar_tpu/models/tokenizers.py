"""Triplane tokenizer (learnable positional embedding).

Equivalent of the reference TriplaneLearnablePositionalEmbedding
(reference: src/models/tokenizers.py:7-41): a learnable (3, C, P, P) grid
added to conditioning planes, flattened to channel-first tokens.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.triplane import planes_to_tokens, tokens_to_planes


class TriplanePositionalEmbedding(nn.Module):
    num_channels: int = 1024
    plane_size: int = 32

    @nn.compact
    def __call__(self, batch_size: int,
                 cond_planes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """-> (B, C, 3*P*P) tokens; cond_planes (B, 3, C, P, P) added if given."""
        emb = self.param(
            "embeddings",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=1.0 / math.sqrt(self.num_channels)),
                (None, "embed", None, None)),
            (3, self.num_channels, self.plane_size, self.plane_size),
        )
        planes = jnp.broadcast_to(emb[None], (batch_size,) + emb.shape)
        if cond_planes is not None:
            planes = planes + cond_planes
        return planes_to_tokens(planes)

    def detokenize(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return tokens_to_planes(tokens, self.plane_size)
