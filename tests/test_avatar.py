"""End-to-end stage-1 model smoke tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.data.synthetic import make_batch
from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
from audio_motion_avatar_tpu.models.config import AvatarConfig
from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
from audio_motion_avatar_tpu.ops import smplx as smplx_ops
from audio_motion_avatar_tpu.parallel import mesh as pmesh

CFG = AvatarConfig.tiny(image_size=(64, 64))
SMPLX = smplx_ops.synthetic_model(seed=0, num_verts=400)
STATICS = build_renderer_statics(SMPLX, subdivide_steps=CFG.subdivide_steps,
                                 densify=CFG.densify_smplx_verts)
NUM_VERTS_ENC = 400 + int(np.asarray(SMPLX.faces).shape[0])


@pytest.fixture(scope="module")
def model_and_vars():
    model = TriplaneGaussianAvatar(cfg=CFG, num_verts_encoder=NUM_VERTS_ENC)
    batch = make_batch(1, 2, (64, 64), seed=0)
    variables = model.init(
        jax.random.PRNGKey(0), STATICS,
        jnp.asarray(batch.video), batch.smpl_parms,
        {k: jnp.asarray(v) for k, v in batch.cam_parms.items()})
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch(1, 2, (64, 64), seed=1)
    out = model.apply(variables, STATICS, jnp.asarray(batch.video),
                      batch.smpl_parms,
                      {k: jnp.asarray(v) for k, v in batch.cam_parms.items()})
    B, T = 1, 2
    R = CFG.triplane_resolution
    assert out.rendered_images.shape == (B, T, 64, 64, 3)
    assert out.triplane_tokens.shape == (B, T, CFG.triplane_feature_dim, 3 * R * R)
    assert out.smpl_tokens.shape == (B, T, CFG.smpl_token_dim, CFG.smpl_token_len)
    assert out.pred_smpl_1["body_pose"].shape == (B, T, 21, 3)
    assert out.pred_smpl_2["betas"].shape == (B, T, 10)
    img = np.asarray(out.rendered_images)
    assert np.isfinite(img).all()
    assert img.min() >= 0 and img.max() <= 1


def test_zero_init_heads_render_faint_gaussians(model_and_vars):
    """With zero-init gaussian heads, opacity=sigmoid(inv_sigmoid(0.1))=0.1 →
    mostly-background render."""
    model, variables = model_and_vars
    batch = make_batch(1, 2, (64, 64), seed=2)
    out = model.apply(variables, STATICS, jnp.asarray(batch.video),
                      batch.smpl_parms,
                      {k: jnp.asarray(v) for k, v in batch.cam_parms.items()})
    g = out.gaussians
    op = np.asarray(jax.nn.sigmoid(g["opacity"]))
    np.testing.assert_allclose(op, 0.1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g["rot"])[..., 0], 1.0, atol=1e-5)
    # colors sigmoid(0) = 0.5
    np.testing.assert_allclose(np.asarray(g["color"]), 0.5, atol=1e-5)


def test_predicted_params_path(model_and_vars):
    """smpl_params_gt=None must run the predicted-parameter path."""
    model, variables = model_and_vars
    batch = make_batch(1, 1, (64, 64), seed=3)
    out = model.apply(variables, STATICS, jnp.asarray(batch.video), None,
                      {k: jnp.asarray(v) for k, v in batch.cam_parms.items()})
    assert out.rendered_images.shape == (1, 1, 64, 64, 3)
    assert np.isfinite(np.asarray(out.rendered_images)).all()


def test_frozen_encoder_no_grads(model_and_vars):
    """Sapiens params must receive zero gradient (frozen, stop_gradient);
    the trainable stack must receive gradient. Note: with the reference's
    zero-init gaussian heads, a purely photometric loss gives zero gradient
    to everything upstream of the heads at step 0 — so the loss here also
    supervises pred_smpl_2 (as stage-1 training does)."""
    model, variables = model_and_vars
    batch = make_batch(1, 1, (64, 64), seed=4)
    cam = {k: jnp.asarray(v) for k, v in batch.cam_parms.items()}
    video = jnp.asarray(batch.video)

    def loss_fn(params):
        out = model.apply({"params": params}, STATICS, video,
                          batch.smpl_parms, cam)
        return ((out.rendered_images ** 2).mean()
                + (out.pred_smpl_2["body_pose"] ** 2).mean()
                + (out.pred_smpl_2["betas"] ** 2).mean())

    grads = jax.grad(loss_fn)(variables["params"])
    sap = jax.tree_util.tree_leaves(grads["sapiens_encoder"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in sap)
    # photometric loss reaches the gaussian heads...
    rend = jax.tree_util.tree_leaves(grads["renderer"])
    assert any(float(jnp.abs(g).max()) > 0 for g in rend)
    # ...and the smplx branch reaches the fusion transformer.
    fus = jax.tree_util.tree_leaves(grads["fusion_network"])
    assert any(float(jnp.abs(g).max()) > 0 for g in fus)


def test_encoder_upsample_triplane_path():
    """The optional high-res scatter + ConvNeXt downsample encoder path
    (triplane_net.py:176-205) keeps the output resolution contract."""
    import dataclasses
    from audio_motion_avatar_tpu.models.triplane_encoder import SMPLXTriplaneEncoder
    enc = SMPLXTriplaneEncoder(
        num_verts=NUM_VERTS_ENC, triplane_resolution=8, feature_dim=32,
        smpl_token_len=8, smpl_token_dim=32, smplx_transformer_layers=1,
        smplx_transformer_head_dim=8, smplx_transformer_num_heads=2,
        image_feature_dim=48, sample_feature=False,
        upsample_triplane=True, upsample_factor=2)
    toks = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16, 48).astype(np.float32))
    batch = make_batch(1, 1, (64, 64), seed=9)
    variables = enc.init(jax.random.PRNGKey(0), SMPLX, toks, None,
                         batch.smpl_parms, None)
    planes, smpl_tokens, pred = enc.apply(variables, SMPLX, toks, None,
                                          batch.smpl_parms, None)
    assert planes.shape == (1, 1, 3, 32, 8, 8)
    assert np.isfinite(np.asarray(planes)).all()


def test_avatar_sh_color_mode_forward():
    """rgb=False (SH branch): the widened shs head + per-view SH evaluation
    run end-to-end through the avatar forward."""
    import dataclasses
    cfg_sh = dataclasses.replace(CFG, rgb=False, sh_degree=1)
    model = TriplaneGaussianAvatar(cfg=cfg_sh, num_verts_encoder=NUM_VERTS_ENC)
    ref = make_batch(1, 1, CFG.image_size, seed=0)
    cam = {k: jnp.asarray(v) for k, v in ref.cam_parms.items()}
    variables = model.init(jax.random.PRNGKey(0), STATICS,
                           jnp.asarray(ref.video), ref.smpl_parms, cam)
    out = model.apply(pmesh.unbox(variables), STATICS,
                      jnp.asarray(ref.video), ref.smpl_parms, cam)
    assert out.gaussians["color"].shape[-1] == 3 * 4  # deg 1 -> 4 coeffs x 3
    assert np.isfinite(np.asarray(out.rendered_images)).all()


def test_avatar_sparse_upsampler_forward():
    """upsampler_sparse=True: tile-sparse final level end-to-end through the
    avatar forward (render included) on CPU."""
    import dataclasses
    cfg_sp = dataclasses.replace(CFG, upsampler_sparse=True,
                                 upsampler_sparse_max_tiles=16)
    model = TriplaneGaussianAvatar(cfg=cfg_sp, num_verts_encoder=NUM_VERTS_ENC)
    ref = make_batch(1, 1, CFG.image_size, seed=0)
    cam = {k: jnp.asarray(v) for k, v in ref.cam_parms.items()}
    variables = model.init(jax.random.PRNGKey(0), STATICS,
                           jnp.asarray(ref.video), ref.smpl_parms, cam)
    out = model.apply(pmesh.unbox(variables), STATICS,
                      jnp.asarray(ref.video), ref.smpl_parms, cam)
    assert np.isfinite(np.asarray(out.rendered_images)).all()
    # param tree identical to the dense upsampler's (checkpoint interop)
    dense = TriplaneGaussianAvatar(cfg=CFG, num_verts_encoder=NUM_VERTS_ENC)
    vd = dense.init(jax.random.PRNGKey(0), STATICS,
                    jnp.asarray(ref.video), ref.smpl_parms, cam)
    td = jax.tree_util.tree_structure(pmesh.unbox(vd))
    ts = jax.tree_util.tree_structure(pmesh.unbox(variables))
    assert td == ts


def test_avatar_sparse_slab_sampling_matches_taps():
    """sample_slab=True (one (2,2C) slab gather per point/plane) renders the
    same images as the 4-tap sparse sampler when coverage is ample."""
    import dataclasses
    cfg_sp = dataclasses.replace(CFG, upsampler_sparse=True,
                                 upsampler_sparse_max_tiles=64)
    cfg_sl = dataclasses.replace(cfg_sp, sample_slab=True)
    ref = make_batch(1, 1, CFG.image_size, seed=0)
    cam = {k: jnp.asarray(v) for k, v in ref.cam_parms.items()}
    model_a = TriplaneGaussianAvatar(cfg=cfg_sp, num_verts_encoder=NUM_VERTS_ENC)
    variables = model_a.init(jax.random.PRNGKey(0), STATICS,
                             jnp.asarray(ref.video), ref.smpl_parms, cam)
    out_a = model_a.apply(pmesh.unbox(variables), STATICS,
                          jnp.asarray(ref.video), ref.smpl_parms, cam)
    model_b = TriplaneGaussianAvatar(cfg=cfg_sl, num_verts_encoder=NUM_VERTS_ENC)
    out_b = model_b.apply(pmesh.unbox(variables), STATICS,
                          jnp.asarray(ref.video), ref.smpl_parms, cam)
    np.testing.assert_allclose(np.asarray(out_b.rendered_images),
                               np.asarray(out_a.rendered_images), atol=1e-4)


def test_auto_unroll_guard():
    """ROUND2 OOM repro: the DENSE upsampler at frames_scan_unroll>=2 with
    6-frame chunks estimates ~17.7 GB of live scan chunks -> auto-tapers to
    1 with a warning; the sparse serving config fits and keeps its unroll
    (models/renderer.py:_auto_unroll)."""
    from audio_motion_avatar_tpu.models.renderer import Renderer

    dense = Renderer(triplane_resolution=32, feature_dim=256,
                     num_upsample_blocks=4, frames_per_chunk=6,
                     scan_remat=False, scan_unroll=8,
                     compute_dtype=jnp.bfloat16, upsampler_sparse=False)
    with pytest.warns(UserWarning, match="frames_scan_unroll tapered"):
        assert dense._auto_unroll(6, 2) == 1

    sparse = Renderer(triplane_resolution=32, feature_dim=256,
                      num_upsample_blocks=4, frames_per_chunk=6,
                      scan_remat=False, scan_unroll=8,
                      compute_dtype=jnp.bfloat16, upsampler_sparse=True,
                      upsampler_sparse_max_tiles=256)
    assert sparse._auto_unroll(6, 2) == 2

    # budget override re-admits the dense unroll
    import os
    os.environ["AMA_SCAN_HBM_BUDGET_GB"] = "64"
    try:
        assert dense._auto_unroll(6, 2) == 2
    finally:
        del os.environ["AMA_SCAN_HBM_BUDGET_GB"]
