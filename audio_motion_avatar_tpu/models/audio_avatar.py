"""Stage-2 composite: audio-driven triplane avatar.

Equivalent of the reference AudioDrivenTriplaneAvatarLightning's model wiring
(reference: src/models/lightning_model_wrapper.py:392-657 + main2.py demo):
the stage-1 TriplaneGaussianAvatar reconstructs (triplane tokens, SMPLX
tokens) from reference frames UNDER stop_gradient (the torch.no_grad at
:435-440), then AudioTriplaneNet rolls the token state forward per audio
frame and the SHARED renderer + SMPLX decoder produce frames.

The prediction-cache curriculum swaps fresh tokens for cached model
predictions; the swap decision is host-side (training/stage2.py), plumbed in
as (use_cache flag, cached tensors) so the compiled graph is static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .audio_net import AudioTriplaneNet
from .avatar import TriplaneGaussianAvatar
from .config import AvatarConfig
from .renderer import RendererStatics
from .triplane_encoder import reshape_params


class AudioAvatarOutput(NamedTuple):
    rendered_images: Optional[jnp.ndarray]   # (B, T_out, H, W, 3)
    gaussians: dict
    pred_smplx_future: dict                  # (B, T_out, ...)
    output_triplane_tokens: jnp.ndarray      # (B, T_out, C, S)
    output_smpl_tokens: jnp.ndarray          # (B, T_out, C, L)
    ref_triplane_tokens: jnp.ndarray         # (B, T_in, C, S) (post-swap)
    ref_smpl_tokens: jnp.ndarray             # (B, T_in, C, L)
    ref_rendered: Optional[jnp.ndarray]


class AudioDrivenAvatar(nn.Module):
    cfg: AvatarConfig
    num_verts_encoder: int
    point_refiner: Optional[nn.Module] = None

    def setup(self):
        c = self.cfg
        self.triplane_gaussian = TriplaneGaussianAvatar(
            cfg=c, num_verts_encoder=self.num_verts_encoder,
            point_refiner=self.point_refiner, name="triplane_gaussian")
        self.audio_triplane = AudioTriplaneNet(
            feature_dim=c.triplane_feature_dim,
            triplane_resolution=c.triplane_resolution,
            smpl_token_len=c.smpl_token_len,
            input_frames=c.triplane_input_frames,
            output_frames=c.triplane_output_frames,
            layers=c.audio_transformer_layers,
            head_dim=c.audio_transformer_head_dim,
            heads=c.audio_transformer_num_heads,
            audio_feature_dim=c.audio_feature_dim,
            compute_dtype=(jnp.bfloat16 if c.compute_dtype == "bfloat16"
                           else None),
            remat=c.audio_transformer_remat,
            attn_impl=c.audio_attn_impl,
            gelu_approx=c.gelu_approx,
            name="audio_triplane")

    def __call__(self, statics: RendererStatics,
                 ref_images: jnp.ndarray, ref_smpl_params: Optional[dict],
                 ref_cam_params: dict, audio_features: jnp.ndarray,
                 target_cam_params: dict,
                 cached_triplanes: Optional[jnp.ndarray] = None,
                 cached_smpl_tokens: Optional[jnp.ndarray] = None,
                 use_cache: Optional[jnp.ndarray] = None,
                 render_ref: bool = False) -> AudioAvatarOutput:
        # ---- stage-1 reconstruction (frozen w.r.t. stage-2 gradients) ----
        out1 = self.triplane_gaussian(statics, ref_images, ref_smpl_params,
                                      ref_cam_params, render=render_ref)
        triplanes = jax.lax.stop_gradient(out1.triplane_tokens)
        smpl_tokens = jax.lax.stop_gradient(out1.smpl_tokens)

        # ---- prediction-cache curriculum swap (host decides) ----
        if cached_triplanes is not None:
            flag = use_cache.astype(triplanes.dtype).reshape(-1, 1, 1, 1)
            triplanes = flag * cached_triplanes + (1 - flag) * triplanes
            smpl_tokens = (flag * cached_smpl_tokens
                           + (1 - flag) * smpl_tokens)

        # ---- audio rollout ----
        out_tri, out_smpl = self.audio_triplane(audio_features, triplanes,
                                                smpl_tokens)

        # ---- decode future SMPLX with the SHARED decoder ----
        B, T_out = out_smpl.shape[:2]
        flat = out_smpl.reshape((B * T_out,) + out_smpl.shape[2:])
        pred_future = reshape_params(
            self.triplane_gaussian.encoder.smpl_decoder(flat), (B, T_out))

        # ---- render through the SHARED renderer ----
        rendered, gaussians = self.triplane_gaussian.renderer(
            statics, out_tri, target_cam_params, pred_future)

        return AudioAvatarOutput(
            rendered_images=rendered, gaussians=gaussians,
            pred_smplx_future=pred_future,
            output_triplane_tokens=out_tri, output_smpl_tokens=out_smpl,
            ref_triplane_tokens=triplanes, ref_smpl_tokens=smpl_tokens,
            ref_rendered=out1.rendered_images)
