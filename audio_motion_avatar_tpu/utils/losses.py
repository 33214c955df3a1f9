"""Training losses, pure JAX.

Mirrors the reference loss stack (src/utils/loss_utils.py): L1/L2, windowed
SSIM on (B,T,H,W,C) images (Gaussian 11x11 window, zero padding, identical
constants), geodesic rotation loss, and the composite SMPLX parameter loss
with the same weights and priors.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import axis_angle_to_matrix


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.clip(mse, 1e-12))


@lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2)) for x in range(window_size)],
        np.float32,
    )
    g = g / g.sum()
    w2 = np.outer(g, g)
    return w2.astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM index on (B, T, H, W, C) images (loss_utils.py:44-82).

    Depthwise Gaussian filtering with zero padding (matching F.conv2d with
    padding=window_size//2), averaged over everything.
    """
    B, T = img1.shape[:2]
    x = img1.reshape((-1,) + img1.shape[2:])  # (BT, H, W, C)
    y = img2.reshape((-1,) + img2.shape[2:])
    C = x.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size, 1.5))
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, C))  # (k, k, 1, C) HWIO depthwise

    def blur(im):
        return jax.lax.conv_general_dilated(
            im, kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu1 = blur(x)
    mu2 = blur(y)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = blur(x * x) - mu1_sq
    s2 = blur(y * y) - mu2_sq
    s12 = blur(x * y) - mu12
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean()


def rotation_geodesic_loss(pred_aa: jnp.ndarray, gt_aa: jnp.ndarray) -> jnp.ndarray:
    """Mean geodesic angle between axis-angle rotation sets
    (loss_utils.py:107-131), incl. the same cos clamp to +-0.999."""
    p = pred_aa.reshape(-1, 3)
    g = gt_aa.reshape(-1, 3)
    Rp = axis_angle_to_matrix(p)
    Rg = axis_angle_to_matrix(g)
    RT = jnp.einsum("nij,nik->njk", Rp, Rg)  # Rp^T Rg
    cos = (jnp.trace(RT, axis1=-2, axis2=-1) - 1.0) / 2.0
    cos = jnp.clip(cos, -0.999, 0.999)
    return jnp.arccos(cos).mean()


def smooth_l1(pred: jnp.ndarray, gt: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - gt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean()


_ROT_KEYS = (
    "global_orient", "body_pose", "left_hand_pose", "right_hand_pose",
    "jaw_pose", "leye_pose", "reye_pose",
)


def smplx_param_loss(pred_params: dict, gt_params: dict, weights: dict | None = None):
    """Composite SMPLX loss (loss_utils.py:133-183): MSE betas (+0.01 prior),
    geodesic poses, L1 expression (+0.01 prior), smooth-L1 transl.
    Returns (total, per-key dict)."""
    if weights is None:
        weights = {}
    losses = {}
    total = 0.0

    if "betas" in pred_params and "betas" in gt_params:
        l_shape = l2_loss(pred_params["betas"], gt_params["betas"].reshape(pred_params["betas"].shape))
        prior = jnp.mean(pred_params["betas"] ** 2)
        losses["betas_mse"] = l_shape
        losses["betas_prior"] = prior
        total = total + weights.get("betas", 1.0) * l_shape + 0.01 * prior

    for key in _ROT_KEYS:
        if key in pred_params and key in gt_params:
            l_geo = rotation_geodesic_loss(pred_params[key], gt_params[key])
            losses[f"{key}_geo"] = l_geo
            total = total + weights.get(key, 1.0) * l_geo

    if "expression" in pred_params and "expression" in gt_params:
        l_expr = l1_loss(pred_params["expression"],
                         gt_params["expression"].reshape(pred_params["expression"].shape))
        prior = jnp.mean(pred_params["expression"] ** 2)
        losses["expression_l1"] = l_expr
        losses["expression_prior"] = prior
        total = total + weights.get("expression", 1.0) * l_expr + 0.01 * prior

    if "transl" in pred_params and "transl" in gt_params:
        l_t = smooth_l1(pred_params["transl"], gt_params["transl"].reshape(pred_params["transl"].shape))
        losses["transl_smoothl1"] = l_t
        total = total + weights.get("transl", 1.0) * l_t

    return total, losses


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray, chunk: int = 2048):
    """Symmetric chamfer distance between point sets (B, N, 3) / (B, M, 3).

    The pytorch3d `chamfer_distance` analog (imported at
    lightning_model_wrapper.py:14; used by the commented-out point-cloud
    loss :151-154). Chunked over N to bound the (N, M) distance block.
    """

    def one_dir(a, b):
        # for each point in a: min squared distance to b
        def body(i):
            blk = jax.lax.dynamic_slice_in_dim(a, i, chunk, axis=0)
            d = ((blk[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return d.min(axis=1)

        n = a.shape[0]
        n_chunks = (n + chunk - 1) // chunk
        pad = n_chunks * chunk - n
        a = jnp.pad(a, ((0, pad), (0, 0)))
        mins = jax.lax.map(body, jnp.arange(n_chunks) * chunk)
        return mins.reshape(-1)[:n].mean()

    def per_batch(a, b):
        return one_dir(a, b) + one_dir(b, a)

    return jax.vmap(per_batch)(x, y).mean()
