"""Feature fusion network.

Equivalent of the reference FeatureFusionNetwork
(reference: src/models/triplane_net.py:339-409): add a learnable triplane
positional embedding, concatenate triplane tokens (3*R*R) with SMPLX tokens
on the sequence axis, run an 8-layer self+cross transformer attending to the
1536-d image tokens, split back.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .tokenizers import TriplanePositionalEmbedding
from .transformer import Transformer1D


class FeatureFusionNetwork(nn.Module):
    triplane_resolution: int = 32
    feature_dim: int = 256
    image_feature_dim: int = 1536
    layers: int = 8
    head_dim: int = 64
    heads: int = 8
    compute_dtype: object = None

    @nn.compact
    def __call__(self, geometry_planes: jnp.ndarray, image_tokens: jnp.ndarray,
                 smpl_tokens: jnp.ndarray):
        """geometry_planes: (B, T, 3, C, R, R); image_tokens: (B, T, S, C_img);
        smpl_tokens: (B, T, C, L). Returns (triplane_tokens (B,T,C,3RR),
        smpl_tokens (B,T,C,L))."""
        B, T = geometry_planes.shape[:2]
        BT = B * T
        planes = geometry_planes.reshape((BT,) + geometry_planes.shape[2:])
        img = image_tokens.reshape((BT,) + image_tokens.shape[2:])
        smpl = smpl_tokens.reshape((BT,) + smpl_tokens.shape[2:])

        tokens = TriplanePositionalEmbedding(
            num_channels=self.feature_dim, plane_size=self.triplane_resolution,
            name="triplane_tokenizer")(BT, planes)  # (BT, C, 3RR)

        combined = jnp.concatenate([tokens, smpl], axis=2)
        # use_flash: self-attention over 3152 tokens materializes
        # (BT, 8, 3152, 3152) logits (~160 MB/layer) on the XLA path; the
        # Pallas kernel (differentiable — the audio rollout trains through
        # it) streams them. Cross-attention keys stay dense (context path).
        out = Transformer1D(
            num_layers=self.layers, heads=self.heads, head_dim=self.head_dim,
            in_channels=self.feature_dim, context_dim=self.image_feature_dim,
            dtype=self.compute_dtype, use_flash=True,
            name="transformer_cross")(combined, img)

        n_tri = tokens.shape[2]
        tri_out = out[:, :, :n_tri]
        smpl_out = out[:, :, n_tri:]
        return (tri_out.reshape(B, T, *tri_out.shape[1:]),
                smpl_out.reshape(B, T, *smpl_out.shape[1:]))
