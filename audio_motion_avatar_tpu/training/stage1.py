"""Stage-1 training step (human representation learning).

Loss layout mirrors TriplaneGaussianAvatarLightning.training_step
(reference: src/models/lightning_model_wrapper.py:82-171):

  loss = [l1 + 0.1*(1-ssim)](ref views)
       + [l1 + 0.1*(1-ssim)](gaussians re-rendered from the TEST cameras)
       + 0.01 * (smplx_param_loss(pred_1) + smplx_param_loss(pred_2))

The whole step — forward, both renders, losses, backward, Adam update — is
ONE jit-compiled function, sharded over the ('data','model') mesh: batch
over 'data', transformer heads/mlp over 'model'; XLA inserts the gradient
all-reduce (the DDP analog) from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.splat import render_multi_view
from ..utils import losses as L
from .train_state import TrainState


def stage1_loss(model, params, statics, ref_batch, test_batch, cfg):
    """Returns (loss, metrics). Batches are VideoBatch pytrees (B, T, ...)."""
    ref_video = ref_batch.video  # (B, T, 3, H, W)
    out = model.apply({"params": params}, statics, ref_video,
                      ref_batch.smpl_parms, ref_batch.cam_parms)

    ref_hwc = jnp.transpose(ref_video, (0, 1, 3, 4, 2))
    l1_train = L.l1_loss(out.rendered_images, ref_hwc)
    ssim_train = 1.0 - L.ssim(out.rendered_images, ref_hwc)
    loss_train = l1_train + 0.1 * ssim_train

    metrics = {"l1_train": l1_train, "ssim_train": ssim_train}

    loss_test = 0.0
    if test_batch is not None:
        # Novel-view supervision: the gaussians of the (single) ref frame
        # re-rendered from every test camera (lightning_model_wrapper.py:109-132).
        B = ref_video.shape[0]
        gaussians_b = {
            k: v.reshape((B, -1) + v.shape[1:])[:, 0]
            for k, v in out.gaussians.items() if k != "shs"
        }
        H, W = cfg.image_size
        novel = render_multi_view(gaussians_b,
                                  test_batch.cam_parms["intrinsic"],
                                  test_batch.cam_parms["extrinsic"],
                                  W, H, max_per_tile=cfg.max_per_tile,
                                  sh_degree=None if cfg.rgb else cfg.sh_degree)
        test_hwc = jnp.transpose(test_batch.video, (0, 1, 3, 4, 2))
        l1_test = L.l1_loss(novel, test_hwc)
        ssim_test = 1.0 - L.ssim(novel, test_hwc)
        loss_test = l1_test + 0.1 * ssim_test
        metrics.update(l1_test=l1_test, ssim_test=ssim_test)

    # Gaussian-head health stats (VERDICT r4 #1): the opacity/scale logits
    # are the collapse channel — saturated-negative opacity (sigmoid ~= 0,
    # dead gradient) renders all-white and freezes. A few scalars per step
    # make the failure mode visible from the curve alone.
    op = out.gaussians["opacity"].astype(jnp.float32)
    sc = out.gaussians["scale"].astype(jnp.float32)
    metrics.update(
        opacity_logit_mean=jnp.mean(op),
        opacity_logit_min=jnp.min(op),
        opacity_logit_max=jnp.max(op),
        opacity_act_mean=jnp.mean(jax.nn.sigmoid(op)),
        scale_logit_mean=jnp.mean(sc),
        scale_act_mean=jnp.mean(jnp.minimum(jnp.exp(sc - 3.9), 0.1)),
    )

    loss_smplx = 0.0
    if out.pred_smpl_1 is not None:
        loss_smplx = loss_smplx + L.smplx_param_loss(out.pred_smpl_1,
                                                     ref_batch.smpl_parms)[0]
    if out.pred_smpl_2 is not None:
        loss_smplx = loss_smplx + L.smplx_param_loss(out.pred_smpl_2,
                                                     ref_batch.smpl_parms)[0]
    metrics["smplx_param_loss"] = loss_smplx

    loss = loss_train + loss_test + 0.01 * loss_smplx
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(model, statics, cfg, with_test_views: bool = True,
                    donate: bool = True):
    """Build the jitted (state, ref, test) -> (state, metrics) step.

    `donate=False` keeps the input state buffers alive (no
    input/output aliasing) — a correctness control for backends where
    donated-buffer aliasing is suspect (round-5 axon investigation)."""

    def step(state: TrainState, ref_batch, test_batch):
        def loss_fn(params):
            return stage1_loss(model, params, statics, ref_batch,
                               test_batch if with_test_views else None, cfg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, statics, cfg):
    def step(params, ref_batch, test_batch):
        _, metrics = stage1_loss(model, params, statics, ref_batch,
                                 test_batch, cfg)
        return metrics

    return jax.jit(step)


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x * x) for x in leaves))


def make_render_fn(model, statics):
    """(params, ref_batch) -> (rendered, target) for the trainer's periodic
    side-by-side dumps (lightning_model_wrapper.py:173-215)."""

    @jax.jit
    def fn(params, ref_batch):
        out = model.apply({"params": params}, statics, ref_batch.video,
                          ref_batch.smpl_parms, ref_batch.cam_parms)
        target = jnp.transpose(ref_batch.video, (0, 1, 3, 4, 2))
        return out.rendered_images, target

    return fn
