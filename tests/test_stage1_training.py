"""Stage-1 train step: runs, decreases loss on one batch (overfit smoke),
and works data-parallel on the 8-device CPU mesh."""

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


def init_state(lr=1e-3):
    model = TriplaneGaussianAvatar(cfg=CFG, num_verts_encoder=NUM_VERTS_ENC)
    ref = make_batch(1, 1, (32, 32), seed=0)
    cam = {k: jnp.asarray(v) for k, v in ref.cam_parms.items()}
    variables = model.init(jax.random.PRNGKey(0), STATICS,
                           jnp.asarray(ref.video), ref.smpl_parms, cam)
    params = pmesh.unbox(variables)["params"]
    tx = make_optimizer(OptimConfig(learning_rate=lr, total_steps=100,
                                    grad_clip=1.0))
    return model, TrainState.create(params, tx)


def jaxify(b):
    return jax.tree_util.tree_map(jnp.asarray, b)


def test_train_step_reduces_loss():
    model, state = init_state()
    step = stage1.make_train_step(model, STATICS, CFG)
    ref = jaxify(make_batch(1, 1, (32, 32), seed=1))
    test = jaxify(make_batch(1, 2, (32, 32), seed=2))

    losses = []
    for _ in range(8):
        state, metrics = step(state, ref, test)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_metrics_keys():
    model, state = init_state()
    step = stage1.make_train_step(model, STATICS, CFG)
    ref = jaxify(make_batch(1, 1, (32, 32), seed=3))
    test = jaxify(make_batch(1, 2, (32, 32), seed=4))
    _, metrics = step(state, ref, test)
    for k in ["loss", "l1_train", "ssim_train", "l1_test", "ssim_test",
              "smplx_param_loss", "grad_norm"]:
        assert k in metrics


def test_data_parallel_mesh():
    """Same step over an 8-device ('data','model') mesh: batch sharded over
    data, params replicated; result must be finite and the state update must
    keep shardings."""
    mesh = pmesh.make_mesh(num_data=4, num_model=2)
    model, state = init_state()
    step = stage1.make_train_step(model, STATICS, CFG)

    ref = jaxify(make_batch(4, 1, (32, 32), seed=5))
    test = jaxify(make_batch(4, 2, (32, 32), seed=6))

    with jax.set_mesh(mesh):
        bsh = pmesh.batch_sharding(mesh)
        ref = jax.device_put(ref, bsh)
        test = jax.device_put(test, bsh)
        state = jax.device_put(state, pmesh.replicated(mesh))
        state, metrics = step(state, ref, test)
        assert np.isfinite(float(metrics["loss"]))


def test_nan_guard_skips_bad_update():
    """Non-finite grads must leave params unchanged (optax.apply_if_finite)."""
    from audio_motion_avatar_tpu.training.train_state import (OptimConfig,
                                                              TrainState,
                                                              make_optimizer)
    tx = make_optimizer(OptimConfig(learning_rate=0.1, total_steps=10,
                                    nan_guard=True))
    params = {"w": jnp.ones(3)}
    state = TrainState.create(params, tx)
    bad = {"w": jnp.asarray([jnp.nan, 1.0, 1.0])}
    state = state.apply_gradients(bad)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)
    good = {"w": jnp.ones(3)}
    state = state.apply_gradients(good)
    assert float(jnp.abs(state.params["w"] - 1.0).max()) > 1e-4
