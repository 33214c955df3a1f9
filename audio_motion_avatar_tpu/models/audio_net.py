"""Audio-driven triplane/SMPLX rollout network (stage 2).

Functional equivalent of the reference AudioTriplaneNet + temporal reducers
(reference: src/models/triplane_audio_net.py):

  * TriplaneTemporalReducer: depthwise conv over the 2-frame time axis
    (:7-42) — here a per-channel weighted sum over T (a (T,) kernel per
    channel), identical math to Conv3d(groups=C*3, kernel=(T,1,1), no bias);
  * SMPLXTemporalReducer: per-token-position temporal self-attention + MLP,
    mean-pooled over time (:44-89);
  * AudioTriplaneNet: query = [triplane-motion | smplx-motion |
    last-triplane | last-smplx] on the sequence axis, then an autoregressive
    rollout over T_output steps, each step cross-attending to that step's
    audio features (:204-257).

TPU delta: the rollout is statically unrolled over the fixed, small T_output
(6) so XLA can pipeline across steps; each step re-applies the same bound
modules (weights shared exactly as in the reference loop).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .transformer import Transformer1D


class TriplaneTemporalReducer(nn.Module):
    """(B, T, C, S=3*R^2) tokens -> (B, C, S): depthwise temporal conv.

    Matches Conv3d(in=3C, out=3C, kernel=(T,1,1), groups=3C, bias=False)
    (triplane_audio_net.py:14-22): each (plane, channel) pair gets its own
    learned T-tap filter. Token layout is plane-major (S = plane*R^2 + pixel,
    ops/triplane.planes_to_tokens), mirroring the reference's plane-major
    channel packing (plane*C + c), so the torch weight (3C,1,T,1,1) maps to
    `time_kernel` via reshape(3, C, T). Operating directly on the token axis
    is exact because the conv never mixes spatial positions.
    """

    channels: int
    time_steps: int

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, T, C, S = tokens.shape
        assert T == self.time_steps and C == self.channels, (tokens.shape,)
        assert S % 3 == 0, (S,)
        w = self.param("time_kernel", nn.initializers.lecun_normal(),
                       (3, C, T))
        x = tokens.reshape(B, T, C, 3, S // 3)
        return jnp.einsum("btcps,pct->bcps", x, w).reshape(B, C, S)


class SMPLXTemporalReducer(nn.Module):
    """(B, T, C, L) -> (B, C, L): temporal self-attn per token position,
    post-LN residuals, mean over time (triplane_audio_net.py:44-89)."""

    channels: int
    time_steps: int
    heads: int = 8

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, T, C, L = tokens.shape
        x = tokens.transpose(0, 3, 1, 2).reshape(B * L, T, C)  # (B*L, T, C)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.heads,
                                               name="self_attn")(x, x)
        x = nn.LayerNorm(name="norm1")(x + attn)
        h = nn.Dense(2 * C, name="mlp1")(x)
        h = nn.relu(h)
        h = nn.Dense(C, name="mlp2")(h)
        x = nn.LayerNorm(name="norm2")(x + h)
        x = x.mean(axis=1)  # (B*L, C)
        return x.reshape(B, L, C).transpose(0, 2, 1)


class AudioTriplaneNet(nn.Module):
    """Autoregressive audio-conditioned token rollout.

    __call__(audio (B, T_audio, C_audio), triplane_tokens (B, T_in, C, S_tri),
    smpl_tokens (B, T_in, C, L)) -> (out_triplane (B, T_out, C, S_tri),
    out_smpl (B, T_out, C, L)). Rendering/decoding happens in the caller
    (the stage-2 composite) so the renderer + SMPLX decoder stay shared.
    """

    feature_dim: int = 256
    triplane_resolution: int = 32
    smpl_token_len: int = 80
    input_frames: int = 2
    output_frames: int = 6
    layers: int = 8
    head_dim: int = 64
    heads: int = 8
    audio_feature_dim: int = 768
    compute_dtype: object = None
    # Remat over transformer blocks: right for training; serving
    # (forward-only) turns it off — remat barriers hurt XLA scheduling
    # even with no backward pass (same finding as the renderer frame scan).
    remat: bool = True
    attn_impl: str = "flash"   # 'flash'|'flash2'|'splash' (models.transformer)
    gelu_approx: bool = False  # serving knob, see models/config.py

    @nn.compact
    def __call__(self, audio_features: jnp.ndarray,
                 triplane_tokens: jnp.ndarray,
                 smpl_tokens: jnp.ndarray):
        B = audio_features.shape[0]
        S_tri = 3 * self.triplane_resolution ** 2
        L = self.smpl_token_len
        assert triplane_tokens.shape[-1] == S_tri, triplane_tokens.shape

        tri_reducer = TriplaneTemporalReducer(self.feature_dim,
                                              self.input_frames,
                                              name="triplane_motion_encoder")
        smpl_reducer = SMPLXTemporalReducer(self.feature_dim,
                                            self.input_frames,
                                            name="smplx_motion_encoder")
        transformer = Transformer1D(
            num_layers=self.layers, heads=self.heads, head_dim=self.head_dim,
            in_channels=self.feature_dim, context_dim=self.audio_feature_dim,
            dtype=self.compute_dtype,
            # S=6304 self-attention: tuned Pallas flash beats XLA 2.76 vs
            # 4.11 ms/layer on v5e (tools/attn_probe.py); TPU-only gate in
            # Attention keeps CPU tests on the dense path.
            use_flash=True,
            # Every AR step discards the leading [tri_motion|smpl_motion]
            # half of the transformer output — only the trailing
            # [new_tri|new_smpl] tokens feed the next step. final_tail makes
            # the last block + proj_out compute only those queries (exact).
            final_tail=S_tri + L,
            remat=self.remat,
            flash_impl=self.attn_impl,
            gelu_approx=self.gelu_approx,
            name="transformer")

        tri_motion = tri_reducer(triplane_tokens)      # (B, C, S_tri)
        smpl_motion = smpl_reducer(smpl_tokens)        # (B, C, L)
        last_tri = triplane_tokens[:, -1]
        last_smpl = smpl_tokens[:, -1]

        # Autoregressive rollout, statically unrolled over the (small, fixed)
        # T_output. The same bound modules are re-applied each step, so
        # weights are shared exactly as in the reference loop
        # (triplane_audio_net.py:210-257). The (new, last) pair ordering in
        # the motion re-encoders also follows the reference (:240-246).
        outs_tri, outs_smpl = [], []
        for t in range(self.output_frames):
            query = jnp.concatenate(
                [tri_motion, smpl_motion, last_tri, last_smpl], axis=-1)
            out = transformer(query, audio_features[:, t:t + 1])
            # out covers only the trailing S_tri+L positions (final_tail)
            new_smpl = out[:, :, -L:]
            new_tri = out[:, :, :S_tri]
            tri_pair = jnp.stack([new_tri, last_tri], axis=1)
            smpl_pair = jnp.stack([last_smpl, new_smpl], axis=1)
            tri_motion = tri_reducer(tri_pair)
            smpl_motion = smpl_reducer(smpl_pair)
            last_tri, last_smpl = new_tri, new_smpl
            outs_tri.append(new_tri)
            outs_smpl.append(new_smpl)

        return jnp.stack(outs_tri, axis=1), jnp.stack(outs_smpl, axis=1)
