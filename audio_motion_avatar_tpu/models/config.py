"""Static model configuration.

One frozen dataclass carries every architecture knob (the flattened
model-config namespace the reference builds in
ConfigLoader.create_model_config, config_loader.py:189-235). Values default
to the reference YAML tree (src/configs/model/*.yaml). `tiny()` is the
scaled-down profile used by unit tests and CI-sized smoke runs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AvatarConfig:
    # triplane_net.yaml
    triplane_resolution: int = 32
    triplane_feature_dim: int = 256
    radius: float = 1.4
    smpl_token_len: int = 80
    smpl_token_dim: int = 256
    smplx_transformer_layers: int = 4
    smplx_transformer_head_dim: int = 64
    smplx_transformer_num_heads: int = 8
    cross_transformer_layers: int = 8
    cross_transformer_head_dim: int = 64
    cross_transformer_num_heads: int = 8
    sample_feature: bool = True
    predict_smplx_params: bool = True
    upsample_triplane_encoder: bool = False   # triplane_net.yaml upsample_triplane
    # renderer.yaml
    upsample_triplane: bool = True
    num_upsample_blocks: int = 4
    densify_smplx_verts: bool = True
    subdivide_steps: int = 2
    no_point_refiner: bool = False
    image_size: Tuple[int, int] = (1024, 1024)   # (H, W)
    rgb: bool = True
    sh_degree: int = 0  # SH degree for the rgb=False view-dependent branch
    max_per_tile: int = 512
    # splat composite implementation: 'pallas' (composite_tiles kernel +
    # custom-VJP backward kernel) | 'tiles' (pure-XLA twin) | 'naive'
    # (gold reference, test sizes only). CPU always falls back to 'tiles'.
    splat_mode: str = "pallas"
    # serving-only splat fast path: value-carrying-sort binning + the
    # segment-DMA Pallas composite (forward-only, no VJP — training keeps
    # the gather-packed composite_tiles with its custom backward kernel)
    splat_segmented: bool = False
    splat_max_window: int = 4     # sorted-binning tile window (W x W tiles)
    # two-tier binning for the segmented serving splat: the splat_large_cap
    # biggest gaussians get the full max_window, the rest a 2x2 window
    # (0 = single-tier). Exact vs single-tier while at most large_cap
    # gaussians span >2 tiles.
    splat_large_cap: int = 0
    # sparse-tile final upsample level (TPU redesign, see models/upsampler):
    # evaluate the 512^2 conv level only on body-covered 16px tiles
    upsampler_sparse: bool = False
    upsampler_sparse_max_tiles: int = 384
    upsampler_sparse_tile_px: int = 16
    # sparse penultimate level too (scatter onto the dense skip background)
    upsampler_sparse_penultimate: bool = False
    upsampler_sparse_pen_max_tiles: int = 128
    upsampler_upconv: str = "poly"  # 'poly' | 'dilated' exact upconv twins
    upsampler_conv: str = "xla"     # 'xla' | 'winograd' ResBlock 3x3 convs
    upsampler_norm: str = "group"   # 'group' | 'affine' (imported inference BN)
    sample_slab: bool = False       # sparse sampling via 2x2 slab gathers
    # sparse sampling via ONE quad-row gather per point/plane (descriptor-
    # bound take: a 4C row costs the same as a C row — gather_probe A1/A6)
    sample_quad: bool = False
    quad_builder: str = "xla"     # 'xla' | 'pallas' (see models/renderer.py)
    # sapiens_encoder.yaml
    image_feature_dim: int = 1536
    vit_depth: int = 40
    vit_heads: int = 24
    vit_patch: int = 16
    sapiens_resolution: int = 1024
    # dataset-coupled
    flat_hand_mean: bool = False
    num_expression_coeffs: int = 10
    smplx_model_path: Optional[str] = None
    # triplane_audio_net.yaml
    triplane_input_frames: int = 2
    triplane_output_frames: int = 6
    audio_transformer_layers: int = 8
    audio_transformer_head_dim: int = 64
    audio_transformer_num_heads: int = 8
    audio_feature_dim: int = 768
    # ptv3_encoder.yaml
    ptv3_enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    ptv3_enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    ptv3_enc_heads: Tuple[int, ...] = (2, 4, 8, 16, 32)
    ptv3_dec_channels: Tuple[int, ...] = (256, 128, 256, 512)
    ptv3_dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    ptv3_dec_heads: Tuple[int, ...] = (4, 4, 8, 16)
    ptv3_patch_size: int = 512
    ptv3_grid_resolution: int = 100
    ptv3_output_dim: int = 256
    # 'float32' | 'bfloat16' — compute dtype for the transformer/conv stacks
    # (params stay fp32; geometry + splatting stay fp32 regardless)
    compute_dtype: str = "float32"
    # frames per renderer scan step: 1 = min memory; more batches the
    # upsampler convs (1.7x MXU efficiency at 6 frames, ~2.4GB bf16/frame
    # of 512^2 plane memory)
    frames_per_chunk: int = 1
    # Renderer frame-scan remat/unroll: remat trades recompute for training
    # memory (required for the backward); serving should disable it (the
    # checkpoint barrier also stops XLA from overlapping one chunk's
    # HBM-bound gathers with the next chunk's convs — set unroll to the
    # chunk count there).
    frames_scan_remat: bool = True
    frames_scan_unroll: int = 1
    # Remat over the audio AR transformer's blocks (48 applications per
    # rollout): training yes, serving no — same barrier cost as above.
    audio_transformer_remat: bool = True
    # Pallas self-attention kernel in the audio transformer: 'flash'
    # (differentiable — training) or 'splash' (forward-only, ~5% faster at
    # B=2 S=6304; serving).
    audio_attn_impl: str = "flash"
    # Serving knob: tanh-approximate GELU in the PTv3 refiner MLPs and the
    # audio transformer's GEGLU FF. Default False = exact erf (torch
    # nn.GELU / diffusers F.gelu — weight-import numerics). erf costs
    # ~1.7x the surrounding matmuls on the VPU at serving N
    # (tools/refiner_probe 2026-08-19: 11.65 ms erf vs 7.23 tanh vs 6.78
    # identity on a (369k, 1024) MLP pair).
    gelu_approx: bool = False
    # demo: consecutive chunks fused into one program (in-graph window
    # slide — exact; amortizes per-dispatch cost). 1 = reference-shaped
    # one-chunk dispatches.
    demo_fuse_chunks: int = 1

    @classmethod
    def default(cls) -> "AvatarConfig":
        return cls()

    @classmethod
    def tiny(cls, image_size=(64, 64)) -> "AvatarConfig":
        """Small-everything profile: same topology, toy widths/depths."""
        return cls(
            triplane_resolution=8,
            triplane_feature_dim=32,
            smpl_token_len=8,
            smpl_token_dim=32,
            smplx_transformer_layers=1,
            smplx_transformer_head_dim=8,
            smplx_transformer_num_heads=2,
            cross_transformer_layers=1,
            cross_transformer_head_dim=8,
            cross_transformer_num_heads=2,
            num_upsample_blocks=1,
            subdivide_steps=0,
            image_size=image_size,
            image_feature_dim=48,
            vit_depth=1,
            vit_heads=2,
            vit_patch=8,
            sapiens_resolution=64,
            audio_transformer_layers=1,
            audio_transformer_head_dim=8,
            audio_transformer_num_heads=2,
            audio_feature_dim=16,
            ptv3_enc_channels=(16, 32),
            ptv3_enc_depths=(1, 1),
            ptv3_enc_heads=(2, 4),
            ptv3_dec_channels=(16,),
            ptv3_dec_depths=(1,),
            ptv3_dec_heads=(2,),
            ptv3_patch_size=64,
            ptv3_output_dim=256,
            max_per_tile=128,
        )
