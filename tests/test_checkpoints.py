"""Orbax checkpoint manager: save/restore round trip with frozen-encoder
exclusion (the reference's on_save_checkpoint key-stripping analog)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.training.checkpoints import (CheckpointManager,
                                                          merge_frozen,
                                                          split_frozen)
from audio_motion_avatar_tpu.training.train_state import (OptimConfig,
                                                          TrainState,
                                                          make_optimizer)


def make_state(seed=0):
    k = jax.random.PRNGKey(seed)
    params = {
        "renderer": {"w": jax.random.normal(k, (4, 4))},
        "sapiens_encoder": {"w": jax.random.normal(k, (3, 3))},  # frozen
    }
    tx = make_optimizer(OptimConfig(learning_rate=1e-2, total_steps=10))
    return TrainState.create(params, tx)


def test_split_excludes_frozen():
    state = make_state()
    train, frozen = split_frozen(state.params)
    assert "sapiens_encoder" not in train
    assert "sapiens_encoder" in frozen
    merged = merge_frozen(train, frozen)
    assert set(merged) == {"renderer", "sapiens_encoder"}


def test_save_restore_roundtrip(tmp_path):
    state = make_state()
    # take a step so opt_state is nontrivial
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)

    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    mgr.save(1, state, metrics={"loss_total": 0.5})

    # fresh state with DIFFERENT values; frozen part must stay local
    state2 = make_state(seed=1)
    local_frozen = np.asarray(state2.params["sapiens_encoder"]["w"])
    restored, ok = mgr.restore(state2)
    assert ok
    np.testing.assert_allclose(np.asarray(restored.params["renderer"]["w"]),
                               np.asarray(state.params["renderer"]["w"]))
    # frozen weights come from the local init, NOT the checkpoint
    np.testing.assert_allclose(np.asarray(restored.params["sapiens_encoder"]["w"]),
                               local_frozen)
    assert int(restored.step) == int(state.step)


def test_restore_without_checkpoint(tmp_path):
    state = make_state()
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, ok = mgr.restore(state)
    assert not ok
    assert restored is state


def test_topk_evicts_worst_not_oldest(tmp_path):
    """ModelCheckpoint semantics (trainer_factory.py:81-103): keep the k BEST
    by monitored metric plus the latest — the worst is evicted even if newer
    than other checkpoints."""
    state = make_state()
    mgr = CheckpointManager(str(tmp_path / "topk"), max_to_keep=2,
                            monitor="val/loss_total", mode="min")
    mgr.save(1, state, metrics={"loss_total": 1.0})
    mgr.save(2, state, metrics={"loss_total": 3.0})   # worst
    mgr.save(3, state, metrics={"loss_total": 0.5})   # best
    mgr.save(4, state, metrics={"loss_total": 2.0})   # latest (kept as last)
    steps = set(mgr._mgr.all_steps())
    assert steps == {1, 3, 4}, steps  # 2 (worst) evicted; 1 older but better


def test_topk_fifo_without_metrics(tmp_path):
    state = make_state()
    mgr = CheckpointManager(str(tmp_path / "fifo"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state)
    assert set(mgr._mgr.all_steps()) == {2, 3}


def test_frozen_params_carry_no_optimizer_state():
    """Adam moments must exist ONLY for trainable params — the frozen
    sapiens_encoder subtree (1B params at full scale, ~10GB of fp32 moments)
    is excluded, matching torch Adam's lazy per-grad state."""
    import jax.numpy as jnp
    import optax
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer, merge_frozen, split_frozen)

    params = {"sapiens_encoder": {"w": jnp.ones((4, 4))},
              "renderer": {"w": jnp.ones((2, 2))}}
    tx = make_optimizer(OptimConfig(nan_guard=False, accumulate_steps=1))
    state = TrainState.create(params, tx)

    import jax
    leaves_paths = jax.tree_util.tree_leaves_with_path(state.opt_state)
    assert not any("sapiens_encoder" in str(p) for p, _ in leaves_paths)
    assert any("renderer" in str(p) for p, _ in leaves_paths)

    # an update touches only the trainable subtree; frozen stays bitwise
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new = state.apply_gradients(grads)
    assert (new.params["sapiens_encoder"]["w"] ==
            params["sapiens_encoder"]["w"]).all()
    assert not (new.params["renderer"]["w"] == params["renderer"]["w"]).all()

    t, f = split_frozen(params)
    assert "sapiens_encoder" in f and "renderer" in t
    back = merge_frozen(t, f)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(params)
