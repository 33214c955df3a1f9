"""Config tree -> static model/optimizer configs."""

from __future__ import annotations

from ..models.config import AvatarConfig
from ..training.train_state import OptimConfig
from .loader import Config, ConfigLoader


def _model_level_overrides(ac: AvatarConfig, cfg: Config) -> AvatarConfig:
    """Overlay scalar keys set DIRECTLY under `model:` whose names are
    AvatarConfig fields (e.g. `model.demo_fuse_chunks=2`,
    `model.gelu_approx=true` from the CLI). Without this, such overrides
    were silently dropped — found because the fused-chunk golden test was
    running unfused on both sides (ROUND4)."""
    import dataclasses
    m = cfg.get("model") or {}
    names = {f.name for f in dataclasses.fields(AvatarConfig)}
    try:
        items = dict(m)
    except Exception:
        return ac
    over = {k: v for k, v in items.items()
            if k in names and not isinstance(v, (dict, type(cfg)))}
    return dataclasses.replace(ac, **over) if over else ac


def build_avatar_config(cfg: Config) -> AvatarConfig:
    """Map the merged YAML tree onto the static AvatarConfig dataclass."""
    if cfg.get("profile") == "tiny":
        import dataclasses
        base = AvatarConfig.tiny(image_size=tuple(cfg.dataset.image_size))
        base = dataclasses.replace(
            base,
            audio_feature_dim=int(cfg.dataset.get("audio_feature_dim", 768)),
            num_expression_coeffs=int(cfg.dataset.get("num_expression_coeffs", 10)),
            flat_hand_mean=bool(cfg.dataset.get("flat_hand_mean", False)))
        # Explicit YAML/CLI SERVING knobs still apply on the tiny profile
        # (they were silently ignored before; found by the serving-profile
        # override test). Scale fields (resolutions, dims, block counts)
        # deliberately stay pinned by the profile.
        knobs = ("upsampler_sparse", "upsampler_sparse_max_tiles",
                 "upsampler_sparse_tile_px", "upsampler_sparse_penultimate",
                 "upsampler_sparse_pen_max_tiles", "upsampler_upconv",
                 "upsampler_conv", "upsampler_norm", "sample_slab", "sample_quad",
                 "splat_segmented", "splat_max_window", "splat_large_cap",
                 "frames_per_chunk", "frames_scan_remat",
                 "frames_scan_unroll", "rgb", "sh_degree",
                 "no_point_refiner")
        rd = (cfg.get("model") or {}).get("renderer", {})
        over = {k: rd[k] for k in knobs if k in rd}
        an = (cfg.get("model") or {}).get("triplane_audio_net", {})
        if "transformer_remat" in an:
            over["audio_transformer_remat"] = an["transformer_remat"]
        if "attn_impl" in an:
            over["audio_attn_impl"] = an["attn_impl"]
        base = dataclasses.replace(base, **over) if over else base
        return _model_level_overrides(base, cfg)

    m = cfg.model
    tn = m.triplane_net
    rd = m.renderer
    se = m.sapiens_encoder
    an = m.get("triplane_audio_net", {})
    ds = cfg.dataset
    ac = AvatarConfig(
        triplane_resolution=tn.triplane_resolution,
        triplane_feature_dim=tn.triplane_feature_dim,
        radius=tn.radius,
        smpl_token_len=tn.smpl_token_len,
        smpl_token_dim=tn.smpl_token_dim,
        smplx_transformer_layers=tn.smplx_transformer_layers,
        smplx_transformer_head_dim=tn.smplx_transformer_head_dim,
        smplx_transformer_num_heads=tn.smplx_transformer_num_heads,
        cross_transformer_layers=tn.cross_transformer_layers,
        cross_transformer_head_dim=tn.cross_transformer_head_dim,
        cross_transformer_num_heads=tn.cross_transformer_num_heads,
        sample_feature=tn.sample_feature,
        predict_smplx_params=tn.predict_smplx_params,
        upsample_triplane_encoder=tn.get("upsample_triplane", False),
        upsample_triplane=rd.upsample_triplane,
        num_upsample_blocks=rd.num_upsample_blocks,
        densify_smplx_verts=rd.densify_smplx_verts,
        subdivide_steps=rd.subdivide_steps,
        no_point_refiner=rd.get("no_point_refiner", False),
        image_size=tuple(ds.image_size),
        rgb=rd.get("rgb", True),
        sh_degree=rd.get("sh_degree", 0),
        max_per_tile=rd.get("max_per_tile", 512),
        upsampler_sparse=rd.get("upsampler_sparse", False),
        upsampler_sparse_max_tiles=rd.get("upsampler_sparse_max_tiles", 384),
        upsampler_sparse_tile_px=rd.get("upsampler_sparse_tile_px", 16),
        upsampler_sparse_penultimate=rd.get("upsampler_sparse_penultimate",
                                            False),
        upsampler_sparse_pen_max_tiles=rd.get("upsampler_sparse_pen_max_tiles",
                                              128),
        upsampler_upconv=rd.get("upsampler_upconv", "poly"),
        upsampler_conv=rd.get("upsampler_conv", "xla"),
        upsampler_norm=rd.get("upsampler_norm", "group"),
        sample_slab=rd.get("sample_slab", False),
        sample_quad=rd.get("sample_quad", False),
        splat_segmented=rd.get("splat_segmented", False),
        splat_max_window=rd.get("splat_max_window", 4),
        splat_large_cap=rd.get("splat_large_cap", 0),
        frames_per_chunk=rd.get("frames_per_chunk", 1),
        frames_scan_remat=rd.get("frames_scan_remat", True),
        frames_scan_unroll=rd.get("frames_scan_unroll", 1),
        audio_transformer_remat=an.get("transformer_remat", True),
        audio_attn_impl=an.get("attn_impl", "flash"),
        image_feature_dim=se.image_feature_dim,
        vit_depth=se.get("vit_depth", 40),
        vit_heads=se.get("vit_heads", 24),
        vit_patch=se.get("vit_patch", 16),
        sapiens_resolution=se.get("sapiens_resolution", 1024),
        flat_hand_mean=ds.flat_hand_mean,
        num_expression_coeffs=ds.num_expression_coeffs,
        smplx_model_path=tn.get("smplx_model_path"),
        triplane_input_frames=an.get("triplane_input_frames", 2),
        triplane_output_frames=an.get("triplane_output_frames", 6),
        audio_transformer_layers=an.get("transformer_layers", 8),
        audio_transformer_head_dim=an.get("transformer_head_dim", 64),
        audio_transformer_num_heads=an.get("transformer_num_heads", 8),
        audio_feature_dim=an.get("audio_feature_dim", 768),
        ptv3_enc_channels=tuple(m.ptv3_encoder.enc_channels),
        ptv3_enc_depths=tuple(m.ptv3_encoder.enc_depths),
        ptv3_enc_heads=tuple(m.ptv3_encoder.enc_num_head),
        ptv3_dec_channels=tuple(m.ptv3_encoder.dec_channels),
        ptv3_dec_depths=tuple(m.ptv3_encoder.dec_depths),
        ptv3_dec_heads=tuple(m.ptv3_encoder.dec_num_head),
        ptv3_patch_size=m.ptv3_encoder.enc_patch_size[0],
        ptv3_grid_resolution=m.ptv3_encoder.grid_resolution,
        ptv3_output_dim=m.ptv3_encoder.output_dim,
    )
    return _model_level_overrides(ac, cfg)


# Serving profile: the bench-measured fast-inference knobs (BASELINE.md
# round-2 trail). Forward-only, so remat off and the frame scan unrolled;
# sparse-tile final upsample level (exact on covered tiles; cap 256 of 1024
# covers the body projection + halo with margin); segmented Pallas splat.
# Every key is only applied when the YAML `model.renderer` section does NOT
# set it explicitly — a config that names a knob always wins.
SERVING_PROFILE = {
    "upsampler_sparse": True,
    "upsampler_sparse_max_tiles": 256,
    "splat_segmented": True,
    "frames_per_chunk": 6,
    "frames_scan_remat": False,
    "frames_scan_unroll": 8,
    # quad-row sparse sampling: exact (tests/test_triplane.py quad suite);
    # 1 descriptor-bound gather + 1 index build per point/plane instead of
    # 4+4 (gather_probe A1/A6: a 4C-wide row costs the same as a C row)
    "sample_quad": True,
    # nearest2x+conv3x3 fused into one input-dilated conv: round-3 TPU sweep
    # winner (17.27 vs 16.19 fps; Winograd measured slower on-chip at 14.83)
    "upsampler_upconv": "dilated",
    # two-tier splat binning (exact while <= large_cap gaussians exceed the
    # window): 18.09 vs 17.41 fps on the r3 prod sweep (2026-08-18)
    "splat_large_cap": 2048,
    # one-pass Pallas quad-row builder (bit-exact vs the XLA build):
    # 20.25 vs 19.38 fps on the r4 sweep (2026-08-19)
    "quad_builder": "pallas",
}

# Model-LEVEL serving keys (cfg.model.<key>, not model.renderer.<key>)
SERVING_PROFILE_MODEL = {
    # tanh gelu in the PTv3 refiner MLPs + audio GEGLU: 21.56 vs 20.32 fps
    # (r4 sweep); quality-cleared by the production parity gate
    # (tests/test_demo_golden.py::test_demo_gelu_tanh_within_parity_budget:
    # frames within mean|diff| <= 1e-2 / PSNR >= 40 dB of the exact-erf
    # golden). Set model.gelu_approx=false for bit-level erf parity runs.
    "gelu_approx": True,
}


def apply_serving_profile(ac: AvatarConfig, cfg: Config) -> AvatarConfig:
    """Overlay SERVING_PROFILE onto `ac` for inference-only entrypoints
    (demo/predict), skipping keys the YAML sets explicitly."""
    import dataclasses
    m = cfg.get("model") or {}
    rd = m.get("renderer", {}) if m else {}
    over = {k: v for k, v in SERVING_PROFILE.items() if k not in rd}
    over.update({k: v for k, v in SERVING_PROFILE_MODEL.items()
                 if k not in m})
    # audio transformer remat is a training knob too
    an = cfg.get("model", {}).get("triplane_audio_net", {}) \
        if cfg.get("model") else {}
    if "transformer_remat" not in an:
        over["audio_transformer_remat"] = False
    return dataclasses.replace(ac, **over) if over else ac


def build_optim_config(cfg: Config) -> OptimConfig:
    t = cfg.training
    return OptimConfig(
        learning_rate=float(t.learning_rate),
        total_steps=int(t.total_steps),
        end_factor=float(t.scheduler.get("end_factor", 0.01)),
        betas=tuple(t.optimizer.get("betas", (0.9, 0.999))),
        weight_decay=float(t.optimizer.get("weight_decay", 0.0)),
        grad_clip=float(t.get("gradient_clip_val", 1.0)),
        accumulate_steps=int(t.get("gradient_accumulate_steps", 1)),
    )


def default_affine_norm_for_import(cfg, checkpoint_path):
    """Imported reference .ckpt FILES fold BatchNorm running stats into the
    upsampler's affine norm slots (training/torch_import._bn_affine);
    running those params under GroupNorm would renormalize and silently
    discard the fold. Default model.renderer.upsampler_norm='affine' when a
    torch file is being imported, unless the YAML/CLI set the knob
    explicitly."""
    import os
    if not checkpoint_path or os.path.isdir(str(checkpoint_path)):
        return cfg
    model = cfg.setdefault("model", type(cfg)())
    rd = model.setdefault("renderer", type(cfg)())
    if "upsampler_norm" not in rd:
        rd["upsampler_norm"] = "affine"
        print("[config] torch .ckpt import: defaulting "
              "model.renderer.upsampler_norm='affine' (folded BatchNorm)")
    return cfg
