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


def _upsample2x_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        dtype=None) -> jnp.ndarray:
    """EXACT polyphase rewrite of conv3x3(SAME)(nearest2x(x)).

    Never materializes the 2x input (xprof: the nearest-2x broadcast +
    layout copies were ~40% of upsampler time) and spends 4 instead of 9
    taps per output pixel: output parity (a, b) only ever sees 2x2 distinct
    low-res pixels, with kernel taps pre-summed per phase:
      rows a=0: [w0, w1+w2] over x[i-1], x[i];  a=1: [w0+w1, w2] over x[i], x[i+1]
    (same for columns), then a depth-to-space interleave.

    x: (B, H, W, C); w: (3, 3, C, Co) — the CANONICAL 3x3 kernel (checkpoint
    layout unchanged); b: (Co,). Returns (B, 2H, 2W, Co).
    """
    import jax.lax as lax
    B, H, W, C = x.shape
    Co = w.shape[-1]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
        b = b.astype(dtype)

    wr0 = jnp.stack([w[0], w[1] + w[2]], axis=0)   # (2, 3, C, Co)
    wr1 = jnp.stack([w[0] + w[1], w[2]], axis=0)

    def col_phases(wr):
        c0 = jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1)  # (2,2,C,Co)
        c1 = jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1)
        return c0, c1

    k00, k01 = col_phases(wr0)
    k10, k11 = col_phases(wr1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def phase(k, a, bcol):
        xin = lax.dynamic_slice(xp, (0, a, bcol, 0), (B, H + 1, W + 1, C))
        return lax.conv_general_dilated(
            xin, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y00 = phase(k00, 0, 0)
    y01 = phase(k01, 0, 1)
    y10 = phase(k10, 1, 0)
    y11 = phase(k11, 1, 1)
    # out[2i+a, 2j+b] = y_ab[i, j]
    rows0 = jnp.stack([y00, y01], axis=3)          # (B, H, W, 2, Co)
    rows1 = jnp.stack([y10, y11], axis=3)
    y = jnp.stack([rows0, rows1], axis=2)          # (B, H, 2, W, 2, Co)
    y = y.reshape(B, 2 * H, 2 * W, Co)
    return y + b


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
        # nearest2x -> conv3x3 computed as the exact fused polyphase form;
        # the parameter stays the canonical (3,3,C,Co) kernel.
        C = x.shape[-1]
        w = self.param("conv_kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.out_channels))
        b = self.param("conv_bias", nn.initializers.zeros,
                       (self.out_channels,))
        h = _upsample2x_conv3x3(x, w, b, dtype=self.dtype)
        h = nn.relu(h)
        return ResBlock(self.out_channels, name="res", dtype=self.dtype)(h)


class TriplaneUpsampler(nn.Module):
    """N x (nearest-2x + conv + ResBlock) with a nearest-2x skip path
    (renderer.py:377-417). 32 -> 32*2^N resolution. Computes in `dtype`
    (bf16 recommended).

    channels_last=True returns (B, 3, H', W', C) in the COMPUTE dtype,
    skipping the output NHWC->NCHW relayout + fp32 cast — at full scale
    those are two extra passes over 18 x 512^2 x 256 of HBM per rollout;
    pair with ops.triplane.sample_triplane_nhwc."""

    feature_dim: int = 256
    num_blocks: int = 4
    dtype: Optional[jnp.dtype] = None
    channels_last: bool = False

    @nn.compact
    def __call__(self, planes: jnp.ndarray) -> jnp.ndarray:
        """planes: (B, 3, C, H, W) -> (B, 3, C, H*2^N, W*2^N)
        (or (B, 3, H*2^N, W*2^N, C) when channels_last)."""
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
        Hn, Wn, Cn = x.shape[1:4]
        if self.channels_last:
            return x.reshape(B, P, Hn, Wn, Cn)
        out = x.astype(jnp.float32).transpose(0, 3, 1, 2)
        return out.reshape(B, P, Cn, Hn, Wn)


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
