import pytest
"""Sapiens converter: synthetic torchscript-style state dict -> our ViT tree."""
import sys, os
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_sapiens import convert, load_sapiens_weights  # noqa: E402

from audio_motion_avatar_tpu.models.image_encoder import SapiensEncoder


def make_torch_style_sd(depth=2, width=32, heads=2, patch=8, res=32):
    rng = np.random.RandomState(0)
    S = (res // patch) ** 2
    sd = {
        "patch_embed.projection.weight": rng.randn(width, 3, patch, patch).astype(np.float32),
        "patch_embed.projection.bias": rng.randn(width).astype(np.float32),
        "pos_embed": rng.randn(1, S, width).astype(np.float32),
        "ln1.weight": rng.randn(width).astype(np.float32),
        "ln1.bias": rng.randn(width).astype(np.float32),
    }
    for i in range(depth):
        p = f"layers.{i}."
        sd[p + "ln1.weight"] = rng.randn(width).astype(np.float32)
        sd[p + "ln1.bias"] = rng.randn(width).astype(np.float32)
        sd[p + "attn.qkv.weight"] = rng.randn(3 * width, width).astype(np.float32)
        sd[p + "attn.qkv.bias"] = rng.randn(3 * width).astype(np.float32)
        sd[p + "attn.proj.weight"] = rng.randn(width, width).astype(np.float32)
        sd[p + "attn.proj.bias"] = rng.randn(width).astype(np.float32)
        sd[p + "ln2.weight"] = rng.randn(width).astype(np.float32)
        sd[p + "ln2.bias"] = rng.randn(width).astype(np.float32)
        sd[p + "ffn.layers.0.0.weight"] = rng.randn(4 * width, width).astype(np.float32)
        sd[p + "ffn.layers.0.0.bias"] = rng.randn(4 * width).astype(np.float32)
        sd[p + "ffn.layers.1.weight"] = rng.randn(width, 4 * width).astype(np.float32)
        sd[p + "ffn.layers.1.bias"] = rng.randn(width).astype(np.float32)
    return sd


@pytest.mark.slow
def test_convert_covers_module_tree(tmp_path):
    import flax
    sd = make_torch_style_sd()
    flat = convert(sd, heads=2)
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **flat)

    import flax.linen as nn
    enc = SapiensEncoder(width=32, depth=2, heads=2, patch=8, resolution=32)
    x = jnp.zeros((1, 3, 32, 32))
    # unbox: the ViT MLP/attention kernels carry TP logical-axis metadata
    variables = nn.meta.unbox(enc.init(jax.random.PRNGKey(0), x))
    tree = flax.traverse_util.flatten_dict(variables["params"], sep="/")

    matched = [k for k in flat if k in tree and tree[k].shape == flat[k].shape]
    missing = [k for k in flat if k not in tree]
    shape_bad = [k for k in flat if k in tree and tree[k].shape != flat[k].shape]
    assert not missing, missing
    assert not shape_bad, [(k, tree[k].shape, flat[k].shape) for k in shape_bad]
    # every converted tensor landed; and the overlay changes the output
    before = enc.apply(variables, x)
    v2 = load_sapiens_weights(variables, npz)
    after = enc.apply(v2, x)
    assert np.abs(np.asarray(before) - np.asarray(after)).max() > 1e-4
    assert np.isfinite(np.asarray(after)).all()
