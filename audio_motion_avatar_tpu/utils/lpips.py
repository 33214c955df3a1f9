"""LPIPS perceptual loss (VGG16 backbone), flax.

Structural port of the lpips package the reference wraps
(reference: src/utils/loss_utils.py:85-103 — defined there, currently
commented out of the training losses). The VGG16 features + per-layer 1x1
linear heads match lpips' net='vgg' topology; pretrained weights load from a
local .npz (converted once from torchvision VGG16 + lpips linear heads via
`convert_torch_weights`) — this image has no network egress, so without the
file the module runs with random features and `pretrained=False` is
reported (useful only as a smoke path, stated loudly).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# VGG16 conv plan: (channels, num_convs) per stage; LPIPS taps the relu
# after each stage.
VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
SHIFT = (-0.030, -0.088, -0.188)
SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        """x: (B, H, W, 3) in [-1, 1] (lpips input scaling). Returns the 5
        stage features."""
        shift = jnp.asarray(SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(SCALE).reshape(1, 1, 1, 3)
        h = (x - shift) / scale
        feats = []
        for si, (ch, n_convs) in enumerate(VGG_STAGES):
            for ci in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding=1, name=f"conv{si}_{ci}")(h)
                h = nn.relu(h)
            feats.append(h)
            if si < len(VGG_STAGES) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(net='vgg'): unit-normalize stage features, squared diff,
    per-layer 1x1 linear head, spatial mean, sum over layers."""

    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1: (B, H, W, 3) in [-1, 1]."""
        vgg = VGG16Features(name="vgg")
        f0 = vgg(img0)
        f1 = vgg(img1)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            # lpips lin weights are non-negative; init at 1/C so the
            # unpretrained fallback is a valid (plain) feature distance.
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}",
                        kernel_init=lambda key, shape, dtype=jnp.float32:
                        jnp.full(shape, 1.0 / shape[-2], dtype))(d)
            total = total + w.mean(axis=(1, 2, 3))
        return total


class LPIPSLoss:
    """Host wrapper with the reference's interface (loss_utils.py:90-103):
    images in [0,1], optional bbox crop, -> scalar mean distance."""

    def __init__(self, weights_path: Optional[str] = None, image_hw=(64, 64)):
        self.module = LPIPS()
        self.pretrained = False
        dummy = jnp.zeros((1, image_hw[0], image_hw[1], 3))
        self.variables = self.module.init(jax.random.PRNGKey(0), dummy, dummy)
        if weights_path and os.path.exists(weights_path):
            loaded = dict(np.load(weights_path))
            self.variables = _overlay_flat(self.variables, loaded)
            self.pretrained = True
        else:
            print("[lpips] no pretrained VGG/lpips weights found -> "
                  "UNPRETRAINED features (smoke use only). Convert weights "
                  "with utils.lpips.convert_torch_weights on a machine with "
                  "torchvision access.")
        self._fn = jax.jit(self.module.apply)

    def __call__(self, img_out, img_target, bbox=None):
        x = jnp.asarray(img_out)
        y = jnp.asarray(img_target)
        if bbox is not None:
            x0, y0, w, h = [int(v) for v in bbox[0]]
            x = x[:, y0:y0 + h, x0:x0 + w]
            y = y[:, y0:y0 + h, x0:x0 + w]
        x = x * 2 - 1
        y = y * 2 - 1
        return self._fn(self.variables, x, y).mean()


def _overlay_flat(variables, flat: dict):
    """Overlay {'vgg/conv0_0/kernel': arr, ...} onto the variables tree."""
    import flax
    tree = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    for k, v in flat.items():
        if k in tree and tree[k].shape == v.shape:
            tree[k] = jnp.asarray(v)
    return {"params": flax.traverse_util.unflatten_dict(tree, sep="/")}


def convert_torch_weights(out_path: str):
    """One-time converter (requires torchvision + lpips wheels + weights):
    writes the flat .npz this module loads. Kept here as the documented
    recipe; not runnable in the zero-egress image."""
    import torch
    import torchvision
    import lpips as lpips_pkg

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    lp = lpips_pkg.LPIPS(net="vgg")
    flat = {}
    conv_i = 0
    stage, within = 0, 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            k = layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            flat[f"vgg/conv{stage}_{within}/kernel"] = k
            flat[f"vgg/conv{stage}_{within}/bias"] = layer.bias.detach().numpy()
            within += 1
            conv_i += 1
            if within == VGG_STAGES[stage][1]:
                stage += 1
                within = 0
    for i, lin in enumerate(lp.lins):
        w = lin.model[1].weight.detach().numpy().transpose(2, 3, 1, 0)
        flat[f"lin{i}/kernel"] = w
    np.savez(out_path, **flat)
