"""Audio feature extraction: speech waveform -> per-video-frame features.

Replaces the reference's dataset-init-time HF Wav2Vec2 pipeline
(reference: src/datasets/dataset_speech_vid.py:37-116): resample to 16 kHz,
trim to video duration, run the encoder per clip-length window, mean-pool
hidden states to ONE 768-d vector per video frame.

Two backends behind one function:
  * the in-repo pure-flax Wav2Vec2 (models/wav2vec2.py, XLA-compiled — the
    north-star "audio features on TPU" path) fed by a torch->flax weight
    conversion when a local facebook/wav2vec2-base-960h checkout is
    configured (HF's own FlaxWav2Vec2Model refuses the base-960h
    do_stable_layer_norm=False architecture);
  * a lightweight conv feature encoder with the same interface otherwise
    (zero-egress image: HF hub downloads are unavailable).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

AUDIO_DIM = 768
SAMPLE_RATE = 16000


class ConvAudioEncoder(nn.Module):
    """Fallback waveform encoder: strided conv stack -> ~49 Hz frame rate,
    768-d — Wav2Vec2's output geometry (conv feature extractor without the
    transformer)."""

    dim: int = AUDIO_DIM

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav: (B, T_samples) -> (B, T_frames, dim); ~320x downsampling."""
        x = wav[..., None]
        for i, (ch, k, s) in enumerate(
                [(64, 10, 5), (128, 3, 2), (256, 3, 2), (256, 3, 2),
                 (512, 3, 2), (512, 2, 2), (self.dim, 2, 2)]):
            x = nn.Conv(ch, (k,), strides=(s,), name=f"conv{i}")(x)
            x = nn.gelu(x)
        return x


class AudioFeatureExtractor:
    """Host-callable extractor with per-video-frame pooling."""

    def __init__(self, model_path: Optional[str] = None, dim: int = AUDIO_DIM,
                 seed: int = 0):
        self.dim = dim
        self._hf = None
        self._normalize = None
        if model_path and os.path.exists(str(model_path)):
            from .wav2vec2 import load_torch_wav2vec2, zero_mean_unit_var
            module, variables, do_normalize = load_torch_wav2vec2(
                str(model_path))
            self._hf = jax.jit(partial(module.apply, variables))
            self._normalize = zero_mean_unit_var if do_normalize else None
        else:
            import warnings
            warnings.warn(
                "AudioFeatureExtractor: no Wav2Vec2 weights at "
                f"{model_path!r} — using the UNTRAINED conv fallback. "
                "Features are random-projection noise; stage-2 runs "
                "mechanically but learns nothing meaningful from audio. "
                "Set dataset.wav2vec2_model_path to a local "
                "facebook/wav2vec2-base-960h checkout for real features "
                "(docs/ASSETS.md).", stacklevel=2)
            self._enc = ConvAudioEncoder(dim=dim)
            self._vars = self._enc.init(jax.random.PRNGKey(seed),
                                        jnp.zeros((1, SAMPLE_RATE)))
            self._apply = jax.jit(self._enc.apply)

    def encode_window(self, wav: np.ndarray) -> np.ndarray:
        """wav: (T_samples,) float32 at 16 kHz -> (T_enc, dim) hidden states.

        With real weights this matches the reference's processor+model pass
        (dataset_speech_vid.py:84-89): per-window zero-mean/unit-var
        normalization, then last_hidden_state."""
        if self._hf is not None:
            if self._normalize is not None:
                wav = self._normalize(wav)
            out = self._hf(jnp.asarray(wav, jnp.float32)[None])
        else:
            out = self._apply(self._vars, jnp.asarray(wav, jnp.float32)[None])
        return np.asarray(out[0])

    def features_per_video_frame(self, wav: np.ndarray, num_frames: int,
                                 frame_rate: float = 24.0,
                                 clip_length: int = 8) -> np.ndarray:
        """Full pipeline (dataset_speech_vid.py:37-116): trim/pad the wave to
        the video duration, encode in clip windows, mean-pool encoder states
        within each video frame's span -> (num_frames, dim).

        Pooling follows the reference's floor semantics (:93-105):
        steps_per_frame = max(1, T_enc // frames_in_clip); frame i pools
        [i*spf, (i+1)*spf) clamped to T_enc (single step if the span is
        empty); a short tail is padded by repeating the last feature
        (:108-115)."""
        need = int(round(num_frames / frame_rate * SAMPLE_RATE))
        wav = np.asarray(wav, np.float32)
        if wav.shape[0] < need:
            wav = np.pad(wav, (0, need - wav.shape[0]))
        wav = wav[:need]

        frames_per_clip = clip_length
        samples_per_clip = int(round(frames_per_clip / frame_rate * SAMPLE_RATE))
        feats = []
        for start_f in range(0, num_frames, frames_per_clip):
            nf = min(frames_per_clip, num_frames - start_f)
            s0 = int(round(start_f / frame_rate * SAMPLE_RATE))
            clip = wav[s0: s0 + samples_per_clip]
            if clip.shape[0] < samples_per_clip:
                clip = np.pad(clip, (0, samples_per_clip - clip.shape[0]))
            hidden = self.encode_window(clip)  # (T_enc, dim)
            T_enc = hidden.shape[0]
            spf = max(1, T_enc // nf)
            for f in range(nf):
                a = min(f * spf, T_enc - 1)
                b = min((f + 1) * spf, T_enc)
                feats.append(hidden[a:b].mean(axis=0) if a < b else hidden[a])
        if len(feats) < num_frames:
            feats.extend([feats[-1]] * (num_frames - len(feats)))
        return np.stack(feats[:num_frames], axis=0)


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int = SAMPLE_RATE) -> np.ndarray:
    """Host-side linear resampler (torchaudio replacement for feature prep)."""
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    n_out = int(round(len(wav) * sr_out / sr_in))
    x_old = np.linspace(0.0, 1.0, num=len(wav), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, np.asarray(wav, np.float64)).astype(np.float32)
