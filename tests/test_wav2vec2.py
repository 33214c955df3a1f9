"""Forward agreement of the pure-flax Wav2Vec2 against HF's torch
implementation (the reference's audio feature extractor,
dataset_speech_vid.py:77-99), on a randomly-initialized tiny config of the
same architecture family as wav2vec2-base-960h (group-norm feature
extractor, do_stable_layer_norm=False post-norm encoder)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audio_motion_avatar_tpu.models.wav2vec2 import (  # noqa: E402
    FlaxWav2Vec2Base, Wav2Vec2ArchConfig, convert_torch_state_dict,
    load_torch_wav2vec2, zero_mean_unit_var)

TINY = dict(hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48, conv_dim=(8,) * 7,
            conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            conv_bias=False)


def _tiny_torch(seed=0):
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(seed)
    cfg = Wav2Vec2Config(do_stable_layer_norm=False,
                         feat_extract_norm="group", vocab_size=32, **TINY)
    return Wav2Vec2Model(cfg).eval(), cfg


def test_forward_agreement_vs_torch():
    model, _ = _tiny_torch()
    wav = np.random.default_rng(0).standard_normal(3200).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(wav)[None]).last_hidden_state.numpy()[0]

    acfg = Wav2Vec2ArchConfig(**TINY)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    flax_model = FlaxWav2Vec2Base(acfg)
    out = np.asarray(flax_model.apply(
        convert_torch_state_dict(sd, acfg), wav[None]))[0]

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_load_from_local_checkout(tmp_path):
    """End-to-end: save_pretrained checkout dir -> load_torch_wav2vec2 ->
    same outputs as the torch model with processor normalization."""
    model, _ = _tiny_torch(seed=1)
    d = tmp_path / "ckpt"
    model.save_pretrained(d)
    with open(d / "preprocessor_config.json", "w") as f:
        json.dump({"do_normalize": True}, f)

    module, variables, do_normalize = load_torch_wav2vec2(str(d))
    assert do_normalize

    wav = np.random.default_rng(1).standard_normal(2400).astype(np.float32)
    normed = zero_mean_unit_var(wav)
    with torch.no_grad():
        ref = model(torch.from_numpy(normed)[None]).last_hidden_state.numpy()[0]
    out = np.asarray(module.apply(variables, normed[None]))[0]
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_extractor_uses_flax_backend(tmp_path):
    """AudioFeatureExtractor(model_path=checkout) exercises the converted
    flax path (not the untrained conv fallback) and pools per video frame
    with the reference's floor semantics."""
    model, _ = _tiny_torch(seed=2)
    d = tmp_path / "ckpt"
    model.save_pretrained(d)

    from audio_motion_avatar_tpu.models.audio_encoder import (
        AudioFeatureExtractor, SAMPLE_RATE)
    ex = AudioFeatureExtractor(model_path=str(d), dim=24)
    assert ex._hf is not None

    wav = np.random.default_rng(2).standard_normal(SAMPLE_RATE).astype(np.float32)
    feats = ex.features_per_video_frame(wav, num_frames=10, frame_rate=24,
                                        clip_length=8)
    assert feats.shape == (10, 24)
    assert np.isfinite(feats).all()
    # floor-pooling check against a hand-computed first clip
    clip_samples = int(round(8 / 24 * SAMPLE_RATE))
    hidden = ex.encode_window(wav[:clip_samples])
    spf = max(1, hidden.shape[0] // 8)
    np.testing.assert_allclose(feats[0], hidden[:spf].mean(0), atol=1e-5)


def test_rejects_stable_layer_norm_config(tmp_path):
    with open(tmp_path / "config.json", "w") as f:
        json.dump({"do_stable_layer_norm": True}, f)
    with pytest.raises(ValueError):
        Wav2Vec2ArchConfig.from_json(str(tmp_path / "config.json"))


def test_base_960h_default_config_shapes():
    """The default arch config IS base-960h; a few-sample forward through a
    param-shape init (no weights) asserts the 768-d / ~49 Hz geometry."""
    import jax
    import jax.numpy as jnp
    m = FlaxWav2Vec2Base(Wav2Vec2ArchConfig())
    out, _ = jax.eval_shape(
        lambda w: m.init_with_output(jax.random.PRNGKey(0), w),
        jnp.zeros((1, 16000), jnp.float32))
    assert out.shape == (1, 49, 768)
