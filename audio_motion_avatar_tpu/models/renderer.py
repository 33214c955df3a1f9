"""Renderer: triplane tokens -> 3D Gaussians -> splatted images.

Functional equivalent of the reference Renderer (reference:
src/models/renderer.py:20-346): token->plane reshape, triplane upsampling,
SMPLX vertex generation with 2-step midpoint subdivision + fixed-count
subselection, bilinear triplane sampling, point-refiner offsets, 5 zero-init
Gaussian heads with the reference's exact bias init
(renderer.py:49-71), Gaussian construction (quat-normalize, sigmoid color,
+transl — renderer.py:319-346), and batched splat rendering.

TPU deltas:
  * the per-view serial render loop (renderer.py:447-479) is a single vmap
    over B*T cameras into the tile renderer;
  * subdivision is static gather tables (ops/subdivision.py), the random
    subselection is a frozen permutation;
  * the point refiner is pluggable: any module mapping (points, feats) ->
    per-point features; models/ptv3.py provides the serialized-attention
    U-Net, or it can be disabled (cfg no_point_refiner).
  * always-on debug prints / CUDA memory dumps (renderer.py:74-199) are
    replaced by the jax.profiler hooks in utils/profiling.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import smplx as smplx_ops
from ..ops import splat, subdivision
from ..ops.math_utils import inverse_sigmoid
from ..ops.triplane import sample_triplane_nhwc, tokens_to_planes
from .triplane_encoder import flatten_params
from .upsampler import TriplaneUpsampler

SUBDIVIDE_VERTS = {0: 10000, 1: 30000, 2: 30000}  # renderer.py:14-18


class RendererStatics(NamedTuple):
    """Host-precomputed geometry constants the renderer closes over.

    CLOSE OVER these in jitted functions (like weights); do not pass them as
    jit arguments — the SMPLX kinematic tree (parents) is consumed as a
    static python value by ops.smplx.lbs."""

    smplx_model: smplx_ops.SmplxModel
    sub_tables: Optional[subdivision.SubdivisionTables]
    subselect: Optional[np.ndarray]   # (num_verts,) int32


def build_renderer_statics(model: smplx_ops.SmplxModel, subdivide_steps: int = 2,
                           densify: bool = True, seed: int = 0) -> RendererStatics:
    if not densify:
        return RendererStatics(model, None, None)
    faces = np.asarray(model.faces)
    tables = subdivision.build_subdivision(model.v_template.shape[0], faces,
                                           subdivide_steps)
    total = tables.num_verts[-1] if tables.num_verts else model.v_template.shape[0]
    keep = min(SUBDIVIDE_VERTS[subdivide_steps], total)
    sel = subdivision.fixed_subselect(total, keep, seed=seed)
    return RendererStatics(model, tables, sel)


class _DenseParams(nn.Module):
    """Kernel/bias params with nn.Dense's exact tree layout ({kernel, bias},
    same shapes/init) but no forward — the Renderer fuses all five Gaussian
    heads into one matmul (checkpoint/torch-import interop preserved)."""

    features_in: int
    features_out: int
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.features_in, self.features_out))
        b = self.param("bias", self.bias_init, (self.features_out,))
        return k, b


class Renderer(nn.Module):
    triplane_resolution: int = 32
    feature_dim: int = 256
    radius: float = 1.4
    upsample_triplane: bool = True
    num_upsample_blocks: int = 4
    densify_smplx_verts: bool = True
    subdivide_steps: int = 2
    image_height: int = 512
    image_width: int = 512
    flat_hand_mean: bool = False
    max_per_tile: int = 512
    point_refiner: Optional[Any] = None   # module: (points, feats) -> (B,N,256)
    compute_dtype: Optional[Any] = None   # bf16 for the conv upsampler only
    splat_mode: str = "pallas"            # 'pallas' | 'tiles' | 'naive'
    splat_segmented: bool = False         # serving-only fwd path (no VJP)
    splat_max_window: int = 4             # sorted-binning tile window
    # two-tier binning: the splat_large_cap biggest gaussians get the full
    # max_window; everything else a 2x2 window (0 = single-tier)
    splat_large_cap: int = 0
    frames_per_chunk: int = 1             # frames per scan step (memory vs MXU)
    scan_remat: bool = True               # remat the frame scan (training)
    scan_unroll: int = 1                  # lax.scan unroll (serving: chunks)
    rgb: bool = True                      # renderer.yaml:22; False -> SH colors
    sh_degree: int = 0                    # SH degree for the rgb=False branch
    # Sparse-tile final upsample level (see TriplaneUpsampler.sparse_final):
    # evaluates the 512^2 level only on body-covered tiles.
    upsampler_sparse: bool = False
    upsampler_sparse_max_tiles: int = 384
    upsampler_sparse_tile_px: int = 16
    upsampler_sparse_penultimate: bool = False
    upsampler_sparse_pen_max_tiles: int = 128
    upsampler_upconv: str = "poly"        # 'poly' | 'dilated' (exact twins)
    # ResBlock 3x3 convs: 'xla' (direct MXU conv) | 'winograd' (Pallas
    # F(2x2,3x3), 4/9 the MACs — ops/winograd.py; bf16-rounding-class
    # numerics, same param tree)
    upsampler_conv: str = "xla"
    # 'group' (training default) | 'affine' — per-channel scale/bias, the
    # exact inference form of the reference's BatchNorm2d after the torch
    # importer folds running stats (training/torch_import.map_upsampler)
    upsampler_norm: str = "group"
    # Sparse sampling via one (2,2C) slab gather per point/plane (halves
    # gathered rows vs the 4-tap form; see ops.triplane.tile_halo).
    sample_slab: bool = False
    # Sparse sampling via ONE quad-row gather per point/plane (row gathers
    # are descriptor-bound — see ops.triplane.quad_rows). Wins over both
    # the 4-tap and slab forms; takes precedence over sample_slab.
    sample_quad: bool = False
    # Quad-layout builder: 'xla' (slice+concat assembly) or 'pallas'
    # (ops.triplane.quad_rows_pallas — one-pass strip-routed copy kernel);
    # identical values, CPU always uses 'xla'.
    quad_builder: str = "xla"

    def setup(self):
        if self.upsample_triplane:
            # channels_last: planes stay NHWC from the conv stack straight
            # into the bilinear gathers — no 512^2-sized relayout passes.
            self.upsampler = TriplaneUpsampler(
                self.feature_dim, self.num_upsample_blocks,
                dtype=self.compute_dtype, channels_last=True,
                sparse_final=self.upsampler_sparse,
                sparse_max_tiles=self.upsampler_sparse_max_tiles,
                sparse_penultimate=self.upsampler_sparse_penultimate,
                sparse_pen_max_tiles=self.upsampler_sparse_pen_max_tiles,
                sparse_tile_px=self.upsampler_sparse_tile_px,
                upconv=self.upsampler_upconv,
                conv_impl=self.upsampler_conv,
                norm_mode=self.upsampler_norm,
                name="upsampler")
        if self.point_refiner is not None:
            self.refine_mlp = nn.Sequential([
                nn.Dense(256), nn.relu,
                nn.Dense(256), nn.relu,
                nn.Dense(3, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros),
            ])

        in_dim = self.feature_dim * 3 + 3
        zeros = nn.initializers.zeros

        def bias_const(vals):
            arr = jnp.asarray(vals, jnp.float32)
            return lambda key, shape, dtype=jnp.float32: jnp.broadcast_to(arr, shape).astype(dtype)

        # Exact reference init (renderer.py:57-71): all-zero kernels, biases
        # xyz=0, rot=[1,0,0,0], scale=-1, opacity=inverse_sigmoid(0.1), shs=0.
        # Heads are params-only modules (same {name}/{kernel,bias} tree as
        # nn.Dense) so the forward can run them as ONE fused matmul: five
        # separate N<128-wide dots each pad the MXU lane dim to 128 AND
        # re-read the (F, N, 771) dec_in from HBM — ~5 ms/rollout at serving
        # scale. dot distributes over output columns, so the fused form is
        # bitwise identical per head.
        self.xyz_layer = _DenseParams(in_dim, 3, zeros, zeros)
        self.rotation_layer = _DenseParams(in_dim, 4, zeros,
                                           bias_const([1.0, 0, 0, 0]))
        self.scaling_layer = _DenseParams(in_dim, 3, zeros,
                                          bias_const([-1.0] * 3))
        self.opacity_layer = _DenseParams(in_dim, 1, zeros,
                                          bias_const([inverse_sigmoid(0.1)]))
        # rgb=True: 3 final RGB channels (reference head, renderer.py:55);
        # rgb=False: 3*(deg+1)^2 SH coefficients evaluated per view
        # (renderer.py:539-547 — the reference head stays 3-wide, which only
        # supports deg 0; widening it is the faithful generalization).
        shs_dim = 3 if self.rgb else 3 * (self.sh_degree + 1) ** 2
        self.shs_layer = _DenseParams(in_dim, shs_dim, zeros, zeros)

    def get_vertices(self, statics: RendererStatics, smpl_params: dict) -> jnp.ndarray:
        """SMPLX forward + static densification (renderer.py:245-290)."""
        verts = smplx_ops.forward(statics.smplx_model, smpl_params,
                                  flat_hand_mean=self.flat_hand_mean)
        if self.densify_smplx_verts and statics.sub_tables is not None:
            verts = subdivision.apply_subdivision(verts, statics.sub_tables)
            verts = jnp.take(verts, jnp.asarray(statics.subselect), axis=-2)
        return verts

    def _render_frame(self, planes_lr: jnp.ndarray, points: jnp.ndarray,
                      transl: jnp.ndarray, K: jnp.ndarray, E: jnp.ndarray,
                      render: bool):
        """One frame CHUNK: (F,3,C,R,R) low-res planes + (F,N,3) body points
        + (F,1,3) transl + (F,3,3)/(F,4,4) cams ->
        (gaussians dict (F,N,...), images (F,H,W,3) or zeros).

        Larger F batches the upsampler convs (B=18 planes hits ~1.7x the
        MXU efficiency of B=3 on v5e, measured) at the cost of F frames of
        512^2 plane memory.
        """
        F = planes_lr.shape[0]
        sparse = self.upsample_triplane and self.upsampler_sparse
        if sparse:
            # per-plane grid_sample coords of the body points drive the
            # covered-tile selection (the halo covers refiner offsets)
            u = jnp.clip(points / self.radius, -1.0, 1.0)    # (F, N, 3)
            from ..ops.triplane import (PLANE_AXES, build_quad,
                                        sample_triplane_sparse,
                                        sample_triplane_sparse_slab,
                                        sample_triplane_sparse_quad,
                                        tile_halo)
            uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], axis=-1)
                            for a0, a1 in PLANE_AXES], axis=1)  # (F,3,N,2)
            planes = self.upsampler(planes_lr, points_uv=uv)
            if self.sample_quad:
                # quad layout built ONCE, shared by both sampling passes
                q = build_quad(planes.tiles, planes.slot, planes.grid,
                               builder=self.quad_builder)
                sample = partial(sample_triplane_sparse_quad, planes, q)
            elif self.sample_slab:
                # halo built ONCE, shared by the pre- and post-refiner passes
                th = jax.vmap(jax.vmap(
                    lambda t, s: tile_halo(t, s, planes.grid)))(
                        planes.tiles, planes.slot)
                sample = partial(sample_triplane_sparse_slab, planes, th)
            else:
                sample = partial(sample_triplane_sparse, planes)
        elif self.upsample_triplane:
            planes = self.upsampler(planes_lr)        # (F, 3, H', W', C)
            sample = partial(sample_triplane_nhwc, planes)
        else:
            planes = jnp.transpose(planes_lr, (0, 1, 3, 4, 2))  # small relayout
            sample = partial(sample_triplane_nhwc, planes)

        feats = sample(points, self.radius)           # (F, N, 3C)
        if self.point_refiner is not None:
            point_feats = self.point_refiner(points, feats)
            offsets = self.refine_mlp(point_feats)
            points = points + offsets
            feats = sample(points, self.radius)

        dec_in = jnp.concatenate([points, feats], axis=-1)
        # one fused (.., 771) x (771, 11+shs) matmul over all five heads
        # (bitwise-equal per column; see setup)
        ks, bs = zip(*(h() for h in (self.xyz_layer, self.rotation_layer,
                                     self.scaling_layer, self.opacity_layer,
                                     self.shs_layer)))
        head_out = dec_in @ jnp.concatenate(ks, axis=1) + jnp.concatenate(bs)
        xyz_off, rot, scale, opacity, shs = jnp.split(
            head_out, [3, 7, 10, 11], axis=-1)

        # construct_gaussians (renderer.py:319-346). The sigmoid applies in
        # BOTH color modes (reference quirk: construct_gaussians sigmoids
        # before the rgb/SH branch in render_one, renderer.py:335,539-547).
        rot = rot / jnp.clip(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-8)
        gaussians = {
            "xyz": points + xyz_off + transl,
            "scale": scale,
            "rot": rot,
            "opacity": opacity,
            "color": jax.nn.sigmoid(shs),
        }
        if render:
            mode = self.splat_mode
            if mode == "pallas" and jax.default_backend() != "tpu":
                mode = "tiles"  # Mosaic kernels only lower on TPU
            sh_deg = None if self.rgb else self.sh_degree
            if mode == "pallas" and self.splat_segmented:
                # Serving fast path: value-carrying-sort binning (no flat
                # s32 index gathers — those lower at <1 GB/s, ~14 ms/frame
                # measured) + one segment-DMA composite grid. FORWARD-ONLY.
                from ..ops import splat_pallas
                img = splat_pallas.render_frames_segmented(
                    gaussians["xyz"], gaussians["rot"], gaussians["scale"],
                    gaussians["opacity"][:, :, 0], gaussians["color"],
                    K, E, self.image_width, self.image_height,
                    max_per_tile=self.max_per_tile,
                    max_window=self.splat_max_window, sh_degree=sh_deg,
                    large_cap=self.splat_large_cap)
            elif mode == "pallas":
                # F frames' tiles composited as ONE Pallas grid (one kernel
                # launch); binning stays F independent sorts
                # (batched_binning=False — the batched (F, N*W^2) sort
                # measured 47 ms/rollout SLOWER at full scale).
                from ..ops import splat_pallas
                img = splat_pallas.render_frames_pallas(
                    gaussians["xyz"], gaussians["rot"], gaussians["scale"],
                    gaussians["opacity"][:, :, 0], gaussians["color"],
                    K, E, self.image_width, self.image_height,
                    max_per_tile=self.max_per_tile,
                    max_window=self.splat_max_window, sh_degree=sh_deg,
                    batched_binning=False)
            else:
                imgs = []
                for f in range(F):
                    imgs.append(splat.render_one(
                        gaussians["xyz"][f], gaussians["rot"][f],
                        gaussians["scale"][f], gaussians["opacity"][f, :, 0],
                        gaussians["color"][f],
                        K[f], E[f], self.image_width, self.image_height,
                        max_per_tile=self.max_per_tile,
                        mode=mode, max_window=self.splat_max_window,
                        sh_degree=sh_deg))
                img = jnp.stack(imgs)
        else:
            img = jnp.zeros((F, self.image_height, self.image_width, 3))
        return gaussians, img

    def __call__(self, statics: RendererStatics, triplane_tokens: jnp.ndarray,
                 cam_params: dict, smpl_params: dict,
                 render: bool = True):
        """triplane_tokens: (B, T, C, 3*R*R); smpl_params: (B, T, ...) dict
        (already decoded — the shared SMPLXDecoder lives in the Avatar).

        Returns (rendered (B,T,H,W,3) or None, gaussians dict (BT,N,...)).

        Frames are processed through an nn.scan so only ONE frame's
        upsampled planes (3 x C x 512^2 at full scale) are live at a time —
        the whole-batch formulation OOMs a 16GB chip at T=6.
        """
        B, T = triplane_tokens.shape[:2]
        BT = B * T
        planes_lr = tokens_to_planes(
            triplane_tokens.reshape(BT, *triplane_tokens.shape[2:]),
            self.triplane_resolution)  # (BT, 3, C, R, R)

        flat_params = flatten_params(smpl_params)
        points = self.get_vertices(statics, flat_params)  # (BT, N, 3)
        transl = flat_params["transl"].reshape(BT, 1, 3)
        Ks = cam_params["intrinsic"].reshape(BT, 3, 3)
        Es = cam_params["extrinsic"].reshape(BT, 4, 4)

        F = self.frames_per_chunk
        if F <= 0 or BT % F != 0:
            F = 1
        n_chunks = BT // F
        unroll = self._auto_unroll(F, n_chunks)

        def chunked(x):
            return x.reshape((n_chunks, F) + x.shape[1:])

        def frame(mdl, carry, x):
            pl, pts, tr, K, E = x
            g, img = mdl._render_frame(pl, pts, tr, K, E, render)
            return carry, (g, img)

        # remat: without it the scan stores every frame's upsampler
        # activations (~4GB bf16/frame at 512^2) for the backward pass.
        # Serving disables it (scan_remat=False) and unrolls: the checkpoint
        # wrapper inserts VMEM-write barrier copies and stops XLA from
        # overlapping one chunk's gathers with the next chunk's convs.
        if self.scan_remat:
            frame = nn.remat(frame, prevent_cse=False)
        scan = nn.scan(frame, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0,
                       unroll=unroll)
        _, (gaussians, images) = scan(
            self, None,
            (chunked(planes_lr), chunked(points), chunked(transl),
             chunked(Ks), chunked(Es)))
        gaussians = {k: v.reshape((BT,) + v.shape[2:])
                     for k, v in gaussians.items()}  # (BT, N, ...)
        gaussians["shs"] = gaussians["color"]

        rendered = None
        if render:
            rendered = images.reshape(B, T, *images.shape[2:])
        return rendered, gaussians

    def _auto_unroll(self, F: int, n_chunks: int) -> int:
        """Scan-unroll with a compile-time HBM guard.

        Unrolling the frame scan lets XLA overlap chunks, but each unrolled
        chunk keeps its upsampler working set live: the DENSE 32->512
        upsampler at frames_scan_unroll=8 compiled to 17.5G > 15.75G HBM
        (ROUND2.md OOM repro). Estimate the live bytes per chunk (~3
        concurrent plane tensors per level: up-conv out, skip, sum) and
        halve the requested unroll until it fits the budget
        (AMA_SCAN_HBM_BUDGET_GB env, default 12 — leaves headroom for
        params, sorts and splat buffers on a 16G v5e), warning once."""
        import os
        import warnings

        unroll = max(1, min(self.scan_unroll, n_chunks))
        if unroll <= 1:
            return unroll
        C = self.feature_dim
        R = self.triplane_resolution
        itemsize = 2 if self.compute_dtype is not None else 4
        if self.upsample_triplane:
            r_final = R * (2 ** self.num_upsample_blocks)
            if self.upsampler_sparse:
                tile = self.upsampler_sparse_tile_px
                grid = max(1, r_final // tile)
                cap = min(self.upsampler_sparse_max_tiles, grid * grid)
                area_final = cap * tile * tile
            else:
                area_final = r_final * r_final
            # dense lower levels sum to < R_final^2 / 3 (geometric)
            area_dense = (r_final * r_final) // 3
            if self.upsampler_sparse:
                area_dense //= 4  # final dense level is R_final/2
        else:
            area_final, area_dense = R * R, 0
        chunk_bytes = F * 3 * C * itemsize * (3 * area_final + 2 * area_dense)
        budget = float(os.environ.get("AMA_SCAN_HBM_BUDGET_GB", "12")) * 1e9
        tapered = unroll
        while tapered > 1 and tapered * chunk_bytes > budget:
            tapered //= 2
        if tapered != unroll:
            warnings.warn(
                f"frames_scan_unroll tapered {unroll} -> {tapered}: "
                f"~{unroll * chunk_bytes / 1e9:.1f} GB of live scan chunks "
                f"exceeds the {budget / 1e9:.1f} GB HBM budget "
                "(set AMA_SCAN_HBM_BUDGET_GB to override)", stacklevel=2)
        return tapered
