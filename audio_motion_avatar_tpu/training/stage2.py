"""Stage-2 training: audio-driven motion generation.

Mirrors AudioDrivenTriplaneAvatarLightning.training_step (reference:
src/models/lightning_model_wrapper.py:418-572):

  loss = 10 * [l1 + 0.1*(1-ssim)](audio-rendered frames)
       + 0.05 * smplx_param_loss(pred_future)

plus the PREDICTION-CACHE CURRICULUM (:442-493): with probability
cache_replacement_prob the fresh stage-1 tokens are replaced by the model's
own predictions cached 12 frames earlier, bounded at 30 self-feeding
iterations, and each step's last-2-frame predictions are written back under
key batch_id+12. The cache is host-side state (PredictionCache); the
device-side swap is a static select inside the jitted step. Cross-process
cache sync (the reference's dist.all_gather_object) is a host hook in
parallel/collectives.py — a no-op single-process, multihost_utils otherwise.
"""

from __future__ import annotations

import random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import losses as L
from .train_state import TrainState

CACHE_FUTURE_OFFSET = 12
CACHE_MAX_ITERS = 30


class PredictionCache:
    """Host-side {(subject, frame): {triplane, smplx_tokens, iter}} store
    (lightning_model_wrapper.py:408-409,442-493)."""

    def __init__(self, replacement_prob: float = 0.0, seed: int = 0):
        self.store = {}
        self.prob = replacement_prob
        self.rng = random.Random(seed)

    def maybe_get(self, batch_id: int, subject_id: int = 0):
        """Returns (use_cache: bool, triplane, smplx_tokens, iter)."""
        if self.prob > 0 and self.rng.random() < self.prob:
            item = self.store.get((subject_id, batch_id))
            if item is not None:
                return True, item["triplane"], item["smplx_tokens"], item["iter"]
        return False, None, None, 0

    def put(self, batch_id: int, out_tri, out_smpl, iter_count: int,
            subject_id: int = 0):
        if self.prob <= 0 or iter_count >= CACHE_MAX_ITERS:
            return None
        key = (subject_id, batch_id + CACHE_FUTURE_OFFSET)
        item = {
            "triplane": np.asarray(out_tri[:, -2:]),
            "smplx_tokens": np.asarray(out_smpl[:, -2:]),
            "iter": iter_count + 1,
        }
        self.store[key] = item
        return {key: item}

    def merge(self, items: dict):
        if items:
            self.store.update(items)


def stage2_loss(model, params, statics, ref_batch, target_batch,
                cached_tri, cached_smpl, use_cache_flag, cfg):
    out = model.apply(
        {"params": params}, statics,
        ref_batch.video, ref_batch.smpl_parms, ref_batch.cam_parms,
        target_batch.audio_features, target_batch.cam_parms,
        cached_triplanes=cached_tri, cached_smpl_tokens=cached_smpl,
        use_cache=use_cache_flag,
        # the reference's stage-2 no-grad stage-1 pass renders the ref
        # frames too (lightning_model_wrapper.py:435-440) and dumps them
        # as ref_comparison images (:548-570)
        render_ref=True)

    target_hwc = jnp.transpose(target_batch.video, (0, 1, 3, 4, 2))
    l1 = L.l1_loss(out.rendered_images, target_hwc)
    ssim = 1.0 - L.ssim(out.rendered_images, target_hwc)
    loss_target = l1 + 0.1 * ssim
    smpl_future = L.smplx_param_loss(out.pred_smplx_future,
                                     target_batch.smpl_parms)[0]
    total = 10.0 * loss_target + 0.05 * smpl_future
    metrics = {
        "l1_target": l1, "ssim_target": ssim, "loss_target": loss_target,
        "smpl_loss_future": smpl_future, "loss": total,
    }
    return total, (metrics, out)


def make_train_step(model, statics, cfg):
    def step(state: TrainState, ref_batch, target_batch,
             cached_tri, cached_smpl, use_cache_flag):
        def loss_fn(params):
            return stage2_loss(model, params, statics, ref_batch,
                               target_batch, cached_tri, cached_smpl,
                               use_cache_flag, cfg)

        (loss, (metrics, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        # rendered/ref images ride along for the periodic comparison dumps
        # (reference :536-570); they are already materialized for the loss,
        # and the host transfer only happens when the observer fetches them
        return (new_state, metrics, out.output_triplane_tokens,
                out.output_smpl_tokens, out.rendered_images, out.ref_rendered)

    return jax.jit(step, donate_argnums=(0,))


def cache_depth_channels(l1_value: float, use_iter: int) -> dict:
    """The reference's per-cache-depth loss channels: the ACTIVE depth's
    channel carries this step's l1, the others log NaN so TB renders
    disjoint curves (lightning_model_wrapper.py:498-508)."""
    out = {}
    for k, s in {0: "no_cache", 1: "cache_1", 2: "cache_2"}.items():
        out[f"l1_loss_{s}"] = l1_value if k == use_iter else float("nan")
    return out


def make_predict_step(model, statics, cfg):
    def step(params, ref_batch, target_batch):
        B = ref_batch.video.shape[0]
        c = cfg
        S = 3 * c.triplane_resolution ** 2
        dummy_tri = jnp.zeros((B, c.triplane_input_frames,
                               c.triplane_feature_dim, S))
        dummy_smpl = jnp.zeros((B, c.triplane_input_frames,
                                c.smpl_token_dim, c.smpl_token_len))
        out = model.apply(
            {"params": params}, statics,
            ref_batch.video, ref_batch.smpl_parms, ref_batch.cam_parms,
            target_batch.audio_features, target_batch.cam_parms,
            cached_triplanes=dummy_tri, cached_smpl_tokens=dummy_smpl,
            use_cache=jnp.zeros((B,), jnp.float32))
        return out.rendered_images, out.output_triplane_tokens, out.output_smpl_tokens

    return jax.jit(step)


class Stage2TrainLoop:
    """Host loop gluing the jitted step to the prediction cache
    (and to the cross-process cache sync hook)."""

    def __init__(self, model, statics, cfg, replacement_prob: float = 0.0,
                 cache_sync=None):
        self.step_fn = make_train_step(model, statics, cfg)
        self.cache = PredictionCache(replacement_prob)
        self.cfg = cfg
        self.cache_sync = cache_sync  # callable(items)->merged items or None
        self.last_rendered = None      # device handles, set each run_step
        self.last_ref_rendered = None

    def run_step(self, state, ref_batch, target_batch, batch_id: int):
        cfg = self.cfg
        B = int(np.asarray(ref_batch.video).shape[0])
        S = 3 * cfg.triplane_resolution ** 2

        use, tri, smpl, iters = self.cache.maybe_get(batch_id)
        if not use:
            tri = np.zeros((B, cfg.triplane_input_frames,
                            cfg.triplane_feature_dim, S), np.float32)
            smpl = np.zeros((B, cfg.triplane_input_frames,
                             cfg.smpl_token_dim, cfg.smpl_token_len), np.float32)
        flag = np.full((B,), 1.0 if use else 0.0, np.float32)

        state, metrics, out_tri, out_smpl, rendered, ref_rendered = \
            self.step_fn(state, ref_batch, target_batch,
                         jnp.asarray(tri), jnp.asarray(smpl),
                         jnp.asarray(flag))
        # device handles for the observer's periodic comparison dumps;
        # no host transfer unless something np.asarray()s them
        self.last_rendered = rendered
        self.last_ref_rendered = ref_rendered

        new_item = self.cache.put(batch_id, out_tri, out_smpl, iters)
        if self.cache_sync is not None:
            gathered = self.cache_sync(new_item or {})
            for d in gathered:
                self.cache.merge(d)
        metrics = dict(metrics)
        metrics["cache_iter"] = float(iters)
        return state, metrics
