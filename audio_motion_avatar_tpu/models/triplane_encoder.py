"""SMPLX-anchored triplane encoder (stage-1 geometry backbone).

Functional equivalent of the reference SMPLXTriplaneEncoder
(reference: src/models/triplane_net.py:66-337):

  1. SMPLX-parameter predictor: learnable query tokens cross-attend to image
     tokens, decoded by SMPLXDecoder (:209-224);
  2. SMPLX forward + face-center densification (:267-318) — pure ops here;
  3. per-vertex learned embedding, optionally concat with z-buffered image
     features at the projected vertices (:137-157);
  4. ConvONet-style local pooling: 3 ResnetFC blocks with scatter-max
     pooling over triplane cells between them, then scatter-mean plane
     generation (:161-198, :226-244).

TPU deltas: torch_scatter -> jax segment ops; the pytorch3d point rasterizer
-> ops.point_raster z-buffer; static vertex count (verts + face centers).
The reference's `upsample_triplane` downsampler path mutates module state
(triplane_net.py:176-205, a documented quirk) — here resolution is a static
field and the down/upsample path lives in models/upsampler.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops import smplx as smplx_ops
from ..ops import subdivision, triplane
from ..ops.point_raster import lift_image_features
from .smplx_decoder import SMPLXDecoder
from .transformer import Transformer1D
from .upsampler import TriplaneDownsampler


class ResnetBlockFC(nn.Module):
    """Pre-activation FC ResNet block, zero-init second layer
    (triplane_net.py:16-58)."""

    size_out: int
    size_h: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)
        net = nn.Dense(size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros,
                      name="fc_1")(nn.relu(net))
        if size_in == self.size_out:
            xs = x
        else:
            xs = nn.Dense(self.size_out, use_bias=False, name="shortcut")(x)
        return xs + dx


class SMPLXTriplaneEncoder(nn.Module):
    num_verts: int                     # verts + face centers (static)
    triplane_resolution: int = 32
    feature_dim: int = 256
    radius: float = 1.4
    smpl_token_len: int = 80
    smpl_token_dim: int = 256
    smplx_transformer_layers: int = 4
    smplx_transformer_head_dim: int = 64
    smplx_transformer_num_heads: int = 8
    image_feature_dim: int = 1536
    sample_feature: bool = True
    predict_smplx_params: bool = True
    num_expression_coeffs: int = 10
    flat_hand_mean: bool = False
    compute_dtype: object = None
    # Optional high-res scatter + learned downsample (the reference's
    # encoder-side upsample_triplane path, triplane_net.py:176-205 — there
    # implemented via mutable resolution state; here static).
    upsample_triplane: bool = False
    upsample_factor: int = 3

    def setup(self):
        if self.predict_smplx_params:
            self.smpl_tokens = self.param(
                "smpl_tokens", nn.initializers.normal(1.0),
                (self.smpl_token_dim, self.smpl_token_len))
            self.cross_attn = Transformer1D(
                num_layers=self.smplx_transformer_layers,
                heads=self.smplx_transformer_num_heads,
                head_dim=self.smplx_transformer_head_dim,
                in_channels=self.smpl_token_dim,
                context_dim=self.image_feature_dim,
                dtype=self.compute_dtype,
                name="smpl_cross_attn")
            self.smpl_decoder = SMPLXDecoder(
                token_dim=self.smpl_token_dim, token_len=self.smpl_token_len,
                num_expression_coeffs=self.num_expression_coeffs,
                name="smpl_decoder")

        emb_dim = self.feature_dim // 2 if self.sample_feature else self.feature_dim
        self.vertex_emb = nn.Embed(self.num_verts, emb_dim, name="vertex_emb")

        self.fc_pos = nn.Dense(2 * self.feature_dim, name="fc_pos")
        self.blocks = [ResnetBlockFC(self.feature_dim, name=f"block_{i}")
                       for i in range(3)]
        self.fc_c = nn.Dense(self.feature_dim, name="fc_c")
        if self.upsample_triplane:
            self.triplane_downsampler = TriplaneDownsampler(
                self.feature_dim, self.upsample_factor,
                name="triplane_downsampler")

    def smpl_predictor(self, image_tokens: jnp.ndarray):
        """image_tokens: (BT, S, C_img) -> (params dict over BT, tokens (BT, C, L))."""
        BT = image_tokens.shape[0]
        q = jnp.broadcast_to(self.smpl_tokens[None],
                             (BT,) + self.smpl_tokens.shape)
        tokens = self.cross_attn(q, image_tokens)
        params = self.smpl_decoder(tokens)
        return params, tokens

    def __call__(self, smplx_model: smplx_ops.SmplxModel,
                 image_tokens: jnp.ndarray,
                 cam_params: Optional[dict] = None,
                 smpl_params_gt: Optional[dict] = None,
                 image_features: Optional[jnp.ndarray] = None):
        """image_tokens: (B, T, S, C_img).

        Returns (planes (B,T,3,C,R,R), smpl_tokens (B,T,C,L), pred_params).
        """
        B, T, S, C = image_tokens.shape
        BT = B * T
        flat_tokens = image_tokens.reshape(BT, S, C)

        pred_params = None
        smpl_tokens = None
        if self.predict_smplx_params:
            pred_params, smpl_tokens = self.smpl_predictor(flat_tokens)

        params = smpl_params_gt if smpl_params_gt is not None else pred_params

        verts = smplx_ops.forward(smplx_model, params,
                                  flat_hand_mean=self.flat_hand_mean)
        import numpy as _np
        verts = subdivision.face_center_densify(verts, _np.asarray(smplx_model.faces))
        assert verts.shape[-2] == self.num_verts, (verts.shape, self.num_verts)

        idx = jnp.arange(self.num_verts)
        verts_emb = jnp.broadcast_to(self.vertex_emb(idx)[None],
                                     (BT, self.num_verts, self.vertex_emb.features))

        if self.sample_feature:
            transl = params["transl"].reshape(BT, 1, 3)
            sampled = lift_image_features(
                verts + transl,
                cam_params["extrinsic"].reshape(BT, 4, 4),
                cam_params["intrinsic"].reshape(BT, 3, 3),
                image_features)
            verts_feat = jnp.concatenate([verts_emb, sampled], axis=-1)
        else:
            verts_feat = verts_emb

        net = self.fc_pos(jnp.concatenate([verts, verts_feat], axis=-1))
        net = self.blocks[0](net)

        res = self.triplane_resolution * (self.upsample_factor
                                          if self.upsample_triplane else 1)
        cell_idx = triplane.plane_cell_index(verts, self.radius, res)  # (BT,3,N)
        for block in self.blocks[1:]:
            pooled = triplane.pool_local_max(net, cell_idx, res)
            net = block(jnp.concatenate([net, pooled], axis=-1))

        c = self.fc_c(net)
        planes = jnp.stack(
            [triplane.scatter_mean_plane(c, cell_idx[:, pi], res)
             for pi in range(3)], axis=1)  # (BT, 3, C, res, res)
        if self.upsample_triplane:
            planes = self.triplane_downsampler(planes)
        planes = planes.reshape(B, T, 3, self.feature_dim,
                                self.triplane_resolution, self.triplane_resolution)

        if smpl_tokens is not None:
            smpl_tokens = smpl_tokens.reshape(B, T, self.smpl_token_dim,
                                              self.smpl_token_len)
        if pred_params is not None:
            pred_params = reshape_params(pred_params, (B, T))
        return planes, smpl_tokens, pred_params


def reshape_params(params: dict, lead: tuple) -> dict:
    """(BT, ...) param dict -> (B, T, ...) following the reference's key
    grouping (triplane_net.py:217-222)."""
    out = {}
    for k, v in params.items():
        out[k] = v.reshape(lead + v.shape[1:])
    return out


def flatten_params(params: dict) -> dict:
    """(B, T, ...) -> (B*T, ...)."""
    return {k: v.reshape((-1,) + v.shape[2:]) for k, v in params.items()}
