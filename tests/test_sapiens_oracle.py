"""Sapiens converter math verified against a torch oracle: a tiny torch ViT
with the mmpretrain naming the converter expects (packed qkv, ffn.layers
Sequential, top-level ln1 final norm), converted with tools/convert_sapiens
.convert, must agree with the flax VisionTransformer forward. This checks
the qkv split order, the (out,in)->(in,H,hd) head reshapes, the patch-conv
transpose, pos-embed handling, and the pre-LN block math — everything the
fixture naming test cannot see."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_sapiens import convert  # noqa: E402

from audio_motion_avatar_tpu.models.image_encoder import (  # noqa: E402
    VisionTransformer)

D, HEADS, DEPTH, PATCH, RES = 16, 2, 2, 4, 16


class _TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(D)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(D, 3 * D)
        self.attn.proj = torch.nn.Linear(D, D)
        self.ln2 = torch.nn.LayerNorm(D)
        self.ffn = torch.nn.Module()
        self.ffn.layers = torch.nn.ModuleList([
            torch.nn.Sequential(torch.nn.Linear(D, 4 * D), torch.nn.GELU()),
            torch.nn.Linear(4 * D, D)])

    def forward(self, x):
        B, S, _ = x.shape
        hd = D // HEADS
        h = self.ln1(x)
        qkv = self.attn.qkv(h).reshape(B, S, 3, HEADS, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)           # (B, H, S, hd) each
        logits = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = torch.softmax(logits, dim=-1) @ v        # (B, H, S, hd)
        out = out.transpose(1, 2).reshape(B, S, D)
        x = x + self.attn.proj(out)
        h = self.ln2(x)
        h = self.ffn.layers[1](self.ffn.layers[0](h))
        return x + h


class _TorchViT(torch.nn.Module):
    """mmpretrain-style naming: patch_embed.projection, pos_embed (with a
    cls slot the converter must drop), layers.N.*, top-level ln1 final."""

    def __init__(self):
        super().__init__()
        self.patch_embed = torch.nn.Module()
        self.patch_embed.projection = torch.nn.Conv2d(3, D, PATCH, PATCH)
        S = (RES // PATCH) ** 2
        self.pos_embed = torch.nn.Parameter(torch.randn(1, S + 1, D) * 0.02)
        self.layers = torch.nn.ModuleList([_TorchBlock() for _ in range(DEPTH)])
        self.ln1 = torch.nn.LayerNorm(D)

    def forward(self, x):
        x = self.patch_embed.projection(x)             # (B, D, gh, gw)
        B, _, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)               # (B, S, D)
        x = x + self.pos_embed[:, 1:]                  # cls slot unused
        for blk in self.layers:
            x = blk(x)
        return self.ln1(x)


def test_converter_forward_agreement():
    torch.manual_seed(0)
    m = _TorchViT().eval()
    img = torch.randn(2, 3, RES, RES)
    with torch.no_grad():
        ref = m(img).numpy()

    flat = convert({k: v.detach().numpy() for k, v in m.state_dict().items()},
                   heads=HEADS)
    assert "vit/pos_embed" in flat and flat["vit/pos_embed"].shape[1] == \
        (RES // PATCH) ** 2

    vit = VisionTransformer(width=D, depth=DEPTH, heads=HEADS, patch=PATCH,
                            resolution=RES)
    x = jnp.asarray(img.numpy())
    import flax.linen as nn
    # unbox: the ViT kernels carry TP logical-axis metadata
    vars0 = nn.meta.unbox(vit.init(jax.random.PRNGKey(0), x))
    tree = flax.traverse_util.flatten_dict(vars0["params"], sep="/")
    n_loaded = 0
    for k, v in flat.items():
        k2 = k[len("vit/"):]
        assert k2 in tree, k2
        assert tree[k2].shape == v.shape, (k2, tree[k2].shape, v.shape)
        tree[k2] = jnp.asarray(v)
        n_loaded += 1
    assert n_loaded == len(tree), (n_loaded, len(tree))
    params = flax.traverse_util.unflatten_dict(tree, sep="/")

    out = np.asarray(vit.apply({"params": params}, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
