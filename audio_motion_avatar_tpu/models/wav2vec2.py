"""Pure-flax Wav2Vec2 encoder (the `wav2vec2-base-960h` architecture) with a
torch-checkpoint converter.

Why this exists: the reference extracts audio features with HF's *torch*
``Wav2Vec2Model`` at dataset-init time (reference:
src/datasets/dataset_speech_vid.py:77-99). The obvious TPU route —
``transformers.FlaxWav2Vec2Model`` — raises ``NotImplementedError`` for
``do_stable_layer_norm=False``, which is exactly the base-960h variant the
reference uses, so HF-Flax cannot load the target checkpoint at all. This
module implements that variant natively:

  * group-norm feature extractor: 7 conv1d stages (k=10,3,3,3,3,2,2 /
    s=5,2,2,2,2,2,2, no bias), GroupNorm(+GELU) after stage 0 only;
  * feature projection LayerNorm -> Dense(512->768);
  * grouped positional conv (k=128, groups=16, weight-normed in torch —
    materialized to a plain kernel at conversion) + same-pad trim + GELU;
  * pre-loop LayerNorm then 12 POST-norm transformer layers (attn ->
    +residual -> LN -> +FF -> LN), exact (erf) GELU everywhere.

``convert_torch_state_dict`` maps the torch key layout (including the
``parametrizations.weight.original{0,1}`` weight-norm storage) onto the flax
param tree; ``load_torch_wav2vec2`` drives it from a local HF checkout.
Forward agreement with the torch implementation is asserted in
tests/test_wav2vec2.py on a randomly-initialized tiny config.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _gelu(x):
    return nn.gelu(x, approximate=False)


@dataclass(frozen=True)
class Wav2Vec2ArchConfig:
    """The architecture fields this implementation consumes (defaults =
    facebook/wav2vec2-base-960h)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_json(cls, path: str) -> "Wav2Vec2ArchConfig":
        with open(path) as f:
            d = json.load(f)
        if d.get("do_stable_layer_norm", False):
            raise ValueError(
                "This implementation covers the do_stable_layer_norm=False "
                "(base) variant; got a stable-layer-norm config.")
        if d.get("feat_extract_norm", "group") != "group":
            raise ValueError("Only feat_extract_norm='group' is supported.")
        keep = {f: d[f] for f in (
            "hidden_size", "num_hidden_layers", "num_attention_heads",
            "intermediate_size", "conv_bias", "num_conv_pos_embeddings",
            "num_conv_pos_embedding_groups", "layer_norm_eps") if f in d}
        for f in ("conv_dim", "conv_kernel", "conv_stride"):
            if f in d:
                keep[f] = tuple(d[f])
        return cls(**keep)


class _EncoderLayer(nn.Module):
    """One post-norm layer: x = LN(x + attn(x)); x = finalLN(x + FF(x))."""

    cfg: Wav2Vec2ArchConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        B, T, _ = x.shape

        def heads(name):
            y = nn.Dense(c.hidden_size, name=name)(x)
            return y.reshape(B, T, c.num_attention_heads, head_dim)

        q = heads("q_proj") * (head_dim ** -0.5)
        k = heads("k_proj")
        v = heads("v_proj")
        logits = jnp.einsum("bthd,bshd->bhts", q, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)
        attn = nn.Dense(c.hidden_size, name="out_proj")(
            attn.reshape(B, T, c.hidden_size))

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x + attn)
        h = nn.Dense(c.intermediate_size, name="ff_intermediate")(x)
        h = nn.Dense(c.hidden_size, name="ff_output")(_gelu(h))
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="final_layer_norm")(x + h)


class FlaxWav2Vec2Base(nn.Module):
    """waveform (B, T_samples) float32 -> last hidden states (B, T_enc, H)."""

    cfg: Wav2Vec2ArchConfig = field(default_factory=Wav2Vec2ArchConfig)

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = wav[..., None]  # (B, T, 1) NWC
        for i, (ch, k, s) in enumerate(
                zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(ch, (k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, name=f"fe_conv{i}")(x)
            if i == 0:
                # torch GroupNorm(num_groups=C, num_channels=C): per-channel
                # instance norm over time
                x = nn.GroupNorm(num_groups=c.conv_dim[0], epsilon=1e-5,
                                 name="fe_group_norm")(x)
            x = _gelu(x)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, name="fp_projection")(x)

        K = c.num_conv_pos_embeddings
        pos = nn.Conv(c.hidden_size, (K,), padding=[(K // 2, K // 2)],
                      feature_group_count=c.num_conv_pos_embedding_groups,
                      name="pos_conv")(x)
        if K % 2 == 0:  # torch SamePadLayer trims the trailing element
            pos = pos[:, :-1]
        x = x + _gelu(pos)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(x)

        for i in range(c.num_hidden_layers):
            x = _EncoderLayer(c, name=f"layer_{i}")(x)
        return x


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _pos_conv_weight(sd: dict) -> np.ndarray:
    """Materialize the weight-normed positional-conv kernel.

    torch stores (g, v) with the norm over dims (0, 1) per kernel position
    (weight_norm dim=2); newer torch uses parametrizations.weight.original0/1,
    older uses weight_g/weight_v. Effective w[:, :, i] = g[i] * v[:, :, i] /
    ||v[:, :, i]||.
    """
    base = "encoder.pos_conv_embed.conv."
    if base + "parametrizations.weight.original0" in sd:
        g = _t(sd[base + "parametrizations.weight.original0"])
        v = _t(sd[base + "parametrizations.weight.original1"])
    elif base + "weight_g" in sd:
        g = _t(sd[base + "weight_g"])
        v = _t(sd[base + "weight_v"])
    else:  # already materialized
        return _t(sd[base + "weight"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_torch_state_dict(sd: dict, cfg: Wav2Vec2ArchConfig) -> dict:
    """torch Wav2Vec2Model.state_dict() -> flax params for FlaxWav2Vec2Base.

    Conv kernels transpose (out, in/groups, k) -> (k, in/groups, out); Dense
    kernels transpose (out, in) -> (in, out); norms map weight/bias ->
    scale/bias.
    """
    p = {}

    def conv_kernel(key):
        return _t(sd[key]).transpose(2, 1, 0)

    def dense(prefix):
        return {"kernel": _t(sd[prefix + ".weight"]).T,
                "bias": _t(sd[prefix + ".bias"])}

    def norm(prefix):
        return {"scale": _t(sd[prefix + ".weight"]),
                "bias": _t(sd[prefix + ".bias"])}

    for i in range(len(cfg.conv_dim)):
        layer = {"kernel": conv_kernel(
            f"feature_extractor.conv_layers.{i}.conv.weight")}
        bkey = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bkey in sd:
            layer["bias"] = _t(sd[bkey])
        p[f"fe_conv{i}"] = layer
    p["fe_group_norm"] = norm("feature_extractor.conv_layers.0.layer_norm")
    p["fp_layer_norm"] = norm("feature_projection.layer_norm")
    p["fp_projection"] = dense("feature_projection.projection")
    p["pos_conv"] = {
        "kernel": _pos_conv_weight(sd).transpose(2, 1, 0),
        "bias": _t(sd["encoder.pos_conv_embed.conv.bias"]),
    }
    p["encoder_layer_norm"] = norm("encoder.layer_norm")
    for i in range(cfg.num_hidden_layers):
        t = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q_proj": dense(t + ".attention.q_proj"),
            "k_proj": dense(t + ".attention.k_proj"),
            "v_proj": dense(t + ".attention.v_proj"),
            "out_proj": dense(t + ".attention.out_proj"),
            "layer_norm": norm(t + ".layer_norm"),
            "ff_intermediate": dense(t + ".feed_forward.intermediate_dense"),
            "ff_output": dense(t + ".feed_forward.output_dense"),
            "final_layer_norm": norm(t + ".final_layer_norm"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, p)}


def load_torch_wav2vec2(model_path: str):
    """Load a local HF torch checkout (config.json + weights) and convert.

    Returns (module, variables, do_normalize) — do_normalize read from
    preprocessor_config.json (default True: base-960h's processor applies
    (x - mean)/sqrt(var + 1e-7) per window before the encoder).
    """
    cfg = Wav2Vec2ArchConfig.from_json(os.path.join(model_path, "config.json"))
    from transformers import Wav2Vec2Model  # torch-side loader
    torch_model = Wav2Vec2Model.from_pretrained(model_path)
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_model.state_dict().items()}
    variables = convert_torch_state_dict(sd, cfg)
    do_normalize = True
    pre = os.path.join(model_path, "preprocessor_config.json")
    if os.path.exists(pre):
        with open(pre) as f:
            do_normalize = bool(json.load(f).get("do_normalize", True))
    return FlaxWav2Vec2Base(cfg), variables, do_normalize


def zero_mean_unit_var(wav: np.ndarray) -> np.ndarray:
    """HF Wav2Vec2FeatureExtractor normalization (feature_extraction_wav2vec2
    zero_mean_unit_var_norm): per-window (x - mean)/sqrt(var + 1e-7)."""
    wav = np.asarray(wav, np.float32)
    return (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
