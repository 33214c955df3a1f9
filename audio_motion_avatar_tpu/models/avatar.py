"""TriplaneGaussianAvatar — the stage-1 composite model.

Equivalent of the reference composite (reference:
src/models/lightning_model_wrapper.py:25-53): frozen image encoder ->
feature pyramid -> SMPLX-triplane encoder -> fusion transformer -> renderer,
with SMPLX parameters predicted TWICE from the same shared decoder — once
pre-fusion inside the encoder (triplane_net.py:127-128) and once post-fusion
on the fused SMPL tokens (renderer.py:104-118) — both supervised.

The SMPLXDecoder weights are shared between the two decode sites by calling
the encoder's bound submodule from here (linen scope sharing), matching the
reference's single-instance wiring (lightning_model_wrapper.py:34-39).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from .config import AvatarConfig
from .fusion import FeatureFusionNetwork
from .image_encoder import ImageFeature, SapiensEncoder
from .renderer import Renderer, RendererStatics
from .triplane_encoder import SMPLXTriplaneEncoder, reshape_params


class AvatarOutput(NamedTuple):
    """The reference's 7-tuple return (lightning_model_wrapper.py:41-53)."""

    rendered_images: Optional[jnp.ndarray]   # (B, T, H, W, 3)
    gaussians: dict                          # (B*T, N, ...)
    triplane_tokens: jnp.ndarray             # (B, T, C, 3RR)
    image_tokens: jnp.ndarray                # (B, T, S, C_img)
    pred_smpl_1: Optional[dict]              # pre-fusion prediction
    pred_smpl_2: Optional[dict]              # post-fusion prediction
    smpl_tokens: jnp.ndarray                 # (B, T, C, L)


class TriplaneGaussianAvatar(nn.Module):
    cfg: AvatarConfig
    num_verts_encoder: int                   # smplx verts + faces (static)
    point_refiner: Optional[nn.Module] = None

    def setup(self):
        c = self.cfg
        import jax.numpy as _jnp
        cdt = _jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.sapiens_encoder = SapiensEncoder(
            width=c.image_feature_dim, depth=c.vit_depth, heads=c.vit_heads,
            patch=c.vit_patch, resolution=c.sapiens_resolution,
            name="sapiens_encoder")
        self.image_feature = ImageFeature(token_dim=c.image_feature_dim,
                                          name="image_feature")
        self.encoder = SMPLXTriplaneEncoder(
            num_verts=self.num_verts_encoder,
            triplane_resolution=c.triplane_resolution,
            feature_dim=c.triplane_feature_dim,
            radius=c.radius,
            smpl_token_len=c.smpl_token_len,
            smpl_token_dim=c.smpl_token_dim,
            smplx_transformer_layers=c.smplx_transformer_layers,
            smplx_transformer_head_dim=c.smplx_transformer_head_dim,
            smplx_transformer_num_heads=c.smplx_transformer_num_heads,
            image_feature_dim=c.image_feature_dim,
            sample_feature=c.sample_feature,
            predict_smplx_params=c.predict_smplx_params,
            num_expression_coeffs=c.num_expression_coeffs,
            flat_hand_mean=c.flat_hand_mean,
            compute_dtype=cdt,
            upsample_triplane=c.upsample_triplane_encoder,
            name="smplx_triplane_encoder")
        self.fusion_network = FeatureFusionNetwork(
            triplane_resolution=c.triplane_resolution,
            feature_dim=c.triplane_feature_dim,
            image_feature_dim=c.image_feature_dim,
            layers=c.cross_transformer_layers,
            head_dim=c.cross_transformer_head_dim,
            heads=c.cross_transformer_num_heads,
            compute_dtype=cdt,
            name="fusion_network")
        self.renderer = Renderer(
            triplane_resolution=c.triplane_resolution,
            feature_dim=c.triplane_feature_dim,
            radius=c.radius,
            upsample_triplane=c.upsample_triplane,
            num_upsample_blocks=c.num_upsample_blocks,
            densify_smplx_verts=c.densify_smplx_verts,
            subdivide_steps=c.subdivide_steps,
            image_height=c.image_size[0],
            image_width=c.image_size[1],
            flat_hand_mean=c.flat_hand_mean,
            max_per_tile=c.max_per_tile,
            splat_mode=c.splat_mode,
            splat_segmented=c.splat_segmented,
            splat_max_window=c.splat_max_window,
            splat_large_cap=c.splat_large_cap,
            point_refiner=self.point_refiner,
            compute_dtype=cdt,
            frames_per_chunk=c.frames_per_chunk,
            scan_remat=c.frames_scan_remat,
            scan_unroll=c.frames_scan_unroll,
            rgb=c.rgb,
            sh_degree=c.sh_degree,
            upsampler_sparse=c.upsampler_sparse,
            upsampler_sparse_max_tiles=c.upsampler_sparse_max_tiles,
            upsampler_sparse_tile_px=c.upsampler_sparse_tile_px,
            upsampler_sparse_penultimate=c.upsampler_sparse_penultimate,
            upsampler_sparse_pen_max_tiles=c.upsampler_sparse_pen_max_tiles,
            upsampler_upconv=c.upsampler_upconv,
            upsampler_conv=c.upsampler_conv,
            upsampler_norm=c.upsampler_norm,
            sample_slab=c.sample_slab,
            sample_quad=c.sample_quad,
            quad_builder=c.quad_builder,
            name="renderer")

    def __call__(self, statics: RendererStatics, images: jnp.ndarray,
                 smpl_params_gt: Optional[dict], cam_params: dict,
                 render: bool = True) -> AvatarOutput:
        """images: (B, T, 3, H, W) in [0,1]; cam_params: intrinsic (B,T,3,3),
        extrinsic (B,T,4,4); smpl_params_gt: (B,T,...) dict or None."""
        B, T = images.shape[:2]
        flat_imgs = images.reshape((B * T,) + images.shape[2:])
        image_tokens = self.sapiens_encoder(flat_imgs)  # (BT, S, C)
        image_tokens = image_tokens.reshape(B, T, *image_tokens.shape[1:])

        image_features = None
        if self.cfg.sample_feature:
            feats = self.image_feature(images, image_tokens)  # (B,T,128,H,W)
            image_features = feats.reshape((B * T,) + feats.shape[2:])

        planes, smpl_tokens, pred_smpl_1 = self.encoder(
            statics.smplx_model, image_tokens, cam_params,
            smpl_params_gt, image_features)

        triplane_tokens, smpl_tokens = self.fusion_network(
            planes, image_tokens, smpl_tokens)

        # Post-fusion SMPLX decode with the SHARED decoder weights.
        pred_smpl_2 = None
        if self.cfg.predict_smplx_params:
            flat_tokens = smpl_tokens.reshape((B * T,) + smpl_tokens.shape[2:])
            pred_smpl_2 = reshape_params(self.encoder.smpl_decoder(flat_tokens),
                                         (B, T))

        render_params = smpl_params_gt if smpl_params_gt is not None else pred_smpl_2
        rendered, gaussians = self.renderer(
            statics, triplane_tokens, cam_params, render_params, render=render)

        return AvatarOutput(rendered, gaussians, triplane_tokens, image_tokens,
                            pred_smpl_1, pred_smpl_2, smpl_tokens)
