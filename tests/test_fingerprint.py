"""Composite numerical fingerprints.

Per-op equivalence tests verify each optimization in isolation; these
fingerprints additionally freeze the COMPOSITE numerics of the serving
stack at fixed seeds, so a perf knob or layout change that silently
alters model output (rather than just its cost) fails loudly.

Values captured on CPU fp32 at the current verified state (2026-08-17,
after the head-major attention + rank-slot sampling batch — all
per-op equivalence suites green). Tolerances are loose enough for op
reassociation (1e-4 rel) but far below any real semantic drift.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_audio_rollout_fingerprint():
    from audio_motion_avatar_tpu.models.audio_net import AudioTriplaneNet

    net = AudioTriplaneNet(feature_dim=32, triplane_resolution=8,
                           smpl_token_len=8, layers=2, head_dim=16, heads=2,
                           audio_feature_dim=16)
    rng = np.random.RandomState(0)
    tri = jnp.asarray(rng.randn(2, 2, 32, 192).astype(np.float32) * 0.1)
    smp = jnp.asarray(rng.randn(2, 2, 32, 8).astype(np.float32) * 0.1)
    aud = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32) * 0.1)
    v = net.init(jax.random.PRNGKey(0), aud, tri, smp)
    ot, os_ = net.apply(v, aud, tri, smp)
    got = np.array([float(ot.mean()), float(ot.std()),
                    float(jnp.abs(ot).max()),
                    float(os_.mean()), float(os_.std()),
                    float(jnp.abs(os_).max())])
    want = np.array([-0.23261316120624542, 4.5980000495910645,
                     33.33199691772461, -0.39660948514938354,
                     4.002919673919678, 21.560386657714844])
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.slow
def test_renderer_sparse_quad_fingerprint():
    """Sparse-tile + quad-sampling renderer forward at fixed seeds (fp32,
    CPU). Covers upsampler sparse level + select_tiles + quad sampling +
    segmented splat + heads in one composite."""
    from audio_motion_avatar_tpu.models.renderer import (
        Renderer, build_renderer_statics)
    from audio_motion_avatar_tpu.models.smplx_decoder import SMPLXDecoder
    from audio_motion_avatar_tpu.models.triplane_encoder import reshape_params
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.data.synthetic import make_batch

    sm = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(sm, subdivide_steps=1, densify=True)
    B, T, C, R = 1, 2, 64, 16
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randn(B, T, C, 3 * R * R).astype(np.float32) * 0.1)
    bt = make_batch(B, T, (128, 128), seed=3, num_expr=10)
    cam = {k: jnp.asarray(v) for k, v in bt.cam_parms.items()}
    dec = SMPLXDecoder(token_dim=C, token_len=80, name="dec")
    dv = dec.init(jax.random.PRNGKey(1), jnp.zeros((B * T, C, 80)))
    pred = reshape_params(
        dec.apply(dv, tokens[..., :80].reshape(B * T, C, 80)), (B, T))
    r = Renderer(triplane_resolution=R, feature_dim=C, upsample_triplane=True,
                 num_upsample_blocks=2, subdivide_steps=1, image_height=128,
                 image_width=128, splat_segmented=True,
                 upsampler_sparse=True, upsampler_sparse_max_tiles=12,
                 sample_quad=True, frames_per_chunk=2, name="renderer")
    v = r.init(jax.random.PRNGKey(0), statics, tokens, cam, pred)
    imgs, gs = r.apply(v, statics, tokens, cam, pred)
    got = np.array([float(imgs.mean()), float(imgs.std()),
                    float(gs["xyz"].mean()),
                    float(jnp.abs(gs["xyz"]).max())])
    want = np.array([0.9941796660423279, 0.045827217400074005,
                     -0.24777851998806, 1.3800462484359741])
    np.testing.assert_allclose(got, want, rtol=1e-4)
