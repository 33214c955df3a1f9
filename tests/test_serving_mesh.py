"""Multi-chip SERVING: the demo rollout sharded over a ('data', 'model')
mesh must equal the single-device rollout.

The demo batches its two interleaved frame streams as B=2 through one
compiled rollout (main2.py) — over a mesh, those streams shard across the
'data' axis and the annotated transformer weights across 'model' (tensor
parallelism), the serving analog of the training dryrun
(__graft_entry__.dryrun_multichip). Runs on the 8-device virtual CPU mesh
(tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.data.synthetic import make_batch
from audio_motion_avatar_tpu.models.audio_avatar import AudioDrivenAvatar
from audio_motion_avatar_tpu.models.config import AvatarConfig
from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
from audio_motion_avatar_tpu.models.triplane_encoder import reshape_params
from audio_motion_avatar_tpu.ops import smplx as smplx_ops
from audio_motion_avatar_tpu.parallel import mesh as pmesh

CFG = AvatarConfig.tiny(image_size=(32, 32))
SMPLX = smplx_ops.synthetic_model(seed=0, num_verts=300)
STATICS = build_renderer_statics(SMPLX, subdivide_steps=0)
NUM_VERTS_ENC = 300 + int(np.asarray(SMPLX.faces).shape[0])


def _rollout_method(mdl, tri, smpl, aud, cam):
    """The serving rollout (serve_bench.build / main2 demo semantics)."""
    out_tri, out_smpl = mdl.audio_triplane(aud, tri, smpl)
    B, T = out_smpl.shape[:2]
    flat = out_smpl.reshape((B * T,) + out_smpl.shape[2:])
    pred = reshape_params(
        mdl.triplane_gaussian.encoder.smpl_decoder(flat), (B, T))
    rendered, _ = mdl.triplane_gaussian.renderer(STATICS, out_tri, cam, pred,
                                                 render=True)
    return rendered


def test_serving_rollout_data_model_mesh_matches_single_device():
    model = AudioDrivenAvatar(cfg=CFG, num_verts_encoder=NUM_VERTS_ENC)
    B = 2
    T_in, T_out = CFG.triplane_input_frames, CFG.triplane_output_frames
    S = 3 * CFG.triplane_resolution ** 2
    rng = np.random.RandomState(0)
    tri = jnp.asarray(rng.randn(B, T_in, CFG.triplane_feature_dim, S)
                      .astype(np.float32) * 0.1)
    smpl = jnp.asarray(rng.randn(B, T_in, CFG.triplane_feature_dim,
                                 CFG.smpl_token_len).astype(np.float32) * 0.1)
    aud = jnp.asarray(rng.randn(B, T_out, CFG.audio_feature_dim)
                      .astype(np.float32) * 0.1)
    tgt = make_batch(B, T_out, CFG.image_size, seed=3,
                     num_expr=CFG.num_expression_coeffs)
    cam = {k: jnp.asarray(v) for k, v in tgt.cam_parms.items()}

    variables = model.init(jax.random.PRNGKey(0), tri, smpl, aud, cam,
                           method=_rollout_method)
    specs = pmesh.logical_specs(variables)["params"]
    params = pmesh.unbox(variables)["params"]

    def apply(p, tri, smpl, aud, cam):
        return model.apply({"params": p}, tri, smpl, aud, cam,
                           method=_rollout_method)

    single = np.asarray(jax.jit(apply)(params, tri, smpl, aud, cam))

    assert len(jax.devices()) >= 4, jax.devices()
    mesh = pmesh.make_mesh(num_data=2, num_model=2,
                           devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        psh = pmesh.to_named_shardings(mesh, specs)
        p_sh = jax.device_put(params, psh)
        # at least one kernel actually sharded over 'model' (serving TP)
        n_model = sum(
            any(ax == "model" for ax in
                jax.tree_util.tree_leaves(tuple(getattr(l.sharding, "spec",
                                                        ()))))
            for l in jax.tree_util.tree_leaves(p_sh))
        assert n_model > 0, "serving TP silently replicated"
        bsh = pmesh.batch_sharding(mesh)
        args = jax.device_put((tri, smpl, aud, cam), bsh)
        sharded = np.asarray(jax.jit(apply)(p_sh, *args))

    assert sharded.shape == single.shape
    # TP collectives reorder the matmul reductions; a ~1e-7 activation
    # delta can cross a splat alpha threshold and shift a pixel by ~1e-3.
    # Budget: bulk agreement near-exact, worst pixel well inside the 1e-2
    # frame parity budget (BASELINE.md).
    diff = np.abs(sharded - single)
    assert np.percentile(diff, 99.9) < 1e-4, np.percentile(diff, 99.9)
    assert diff.max() < 5e-3, diff.max()
