"""Triplane up/down-samplers.

Equivalents of the reference TriplaneUpsampler (renderer.py:348-417) and
TriplaneDownsampler/ConvNeXtBlock (triplane_net.py:411-451).

Deviation (documented): the reference's ResBlock uses BatchNorm2d — mutable
running stats that are ill-posed at the reference's batch size 1 and need
cross-replica sync under data parallelism. We use GroupNorm (stat-free,
SPMD-clean); same normalization granularity at GN(32).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from typing import Optional


def _nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample via broadcast-reshape (fuses better on TPU than
    chained jnp.repeat)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class ResBlock(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) channel-last (native TPU conv layout)."""
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, name="norm1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=32, name="norm2", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(h)
        skip = x if in_ch == self.out_channels else nn.Conv(
            self.out_channels, (1, 1), name="skip", dtype=self.dtype)(x)
        return skip + h


class UpsampleBlock(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        up = _nearest2x(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv",
                    dtype=self.dtype)(up)
        h = nn.relu(h)
        return ResBlock(self.out_channels, name="res", dtype=self.dtype)(h)


class TriplaneUpsampler(nn.Module):
    """N x (nearest-2x + conv + ResBlock) with a nearest-2x skip path
    (renderer.py:377-417). 32 -> 32*2^N resolution. Computes in `dtype`
    (bf16 recommended), returns float32."""

    feature_dim: int = 256
    num_blocks: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, planes: jnp.ndarray) -> jnp.ndarray:
        """planes: (B, 3, C, H, W) -> (B, 3, C, H*2^N, W*2^N)."""
        B, P, C, H, W = planes.shape
        x = planes.reshape(B * P, C, H, W).transpose(0, 2, 3, 1)  # NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # The skip path is a RUNNING buffer of the input, 1x1-projected once
        # then nearest-upsampled each step (renderer.py:390-413).
        skip = x
        for i in range(self.num_blocks):
            up = UpsampleBlock(self.feature_dim, name=f"up_{i}",
                               dtype=self.dtype)(x)
            if i == 0:
                skip = nn.Conv(self.feature_dim, (1, 1), name="skip_proj",
                               dtype=self.dtype)(skip)
            skip = _nearest2x(skip)
            x = up + skip
        out = x.astype(jnp.float32).transpose(0, 3, 1, 2)
        Hn, Wn = out.shape[-2:]
        return out.reshape(B, P, C, Hn, Wn)


class ConvNeXtBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pw1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        return x + h


class TriplaneDownsampler(nn.Module):
    feature_dim: int = 256
    factor: int = 3

    @nn.compact
    def __call__(self, planes: jnp.ndarray) -> jnp.ndarray:
        """planes: (B, 3, C, H, W) -> (B, 3, C, H//f, W//f)."""
        B, P, C, H, W = planes.shape
        x = planes.reshape(B * P, C, H, W).transpose(0, 2, 3, 1)
        for i in range(2):
            x = ConvNeXtBlock(self.feature_dim, name=f"block_{i}")(x)
        x = nn.Conv(self.feature_dim, (4, 4), strides=self.factor, padding=1,
                    name="down")(x)
        out = x.transpose(0, 3, 1, 2)
        return out.reshape(B, P, C, out.shape[-2], out.shape[-1])
