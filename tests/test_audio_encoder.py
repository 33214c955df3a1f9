import pytest
import numpy as np

from audio_motion_avatar_tpu.models.audio_encoder import (
    AudioFeatureExtractor, resample_linear, SAMPLE_RATE)


@pytest.mark.slow
def test_features_per_video_frame_shapes():
    ex = AudioFeatureExtractor(model_path=None, dim=768)
    wav = np.random.RandomState(0).randn(SAMPLE_RATE).astype(np.float32) * 0.1
    feats = ex.features_per_video_frame(wav, num_frames=24, frame_rate=24,
                                        clip_length=8)
    assert feats.shape == (24, 768)
    assert np.isfinite(feats).all()


@pytest.mark.slow
def test_features_depend_on_audio():
    ex = AudioFeatureExtractor(model_path=None, dim=768)
    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    a = ex.features_per_video_frame(np.sin(2 * np.pi * 220 * t).astype(np.float32),
                                    12, 24, 4)
    b = ex.features_per_video_frame(np.sin(2 * np.pi * 880 * t).astype(np.float32),
                                    12, 24, 4)
    assert np.abs(a - b).max() > 1e-3


def test_short_audio_padded():
    ex = AudioFeatureExtractor(model_path=None, dim=768)
    wav = np.zeros(100, np.float32)  # far shorter than the video
    feats = ex.features_per_video_frame(wav, num_frames=10, frame_rate=24,
                                        clip_length=4)
    assert feats.shape == (10, 768)


def test_resample_linear():
    wav = np.sin(np.linspace(0, 20 * np.pi, 44100)).astype(np.float32)
    out = resample_linear(wav, 44100, 16000)
    assert abs(out.shape[0] - 16000) <= 1
    # same signal envelope
    assert abs(out.max() - wav.max()) < 0.05


@pytest.mark.slow
def test_lpips_smoke():
    import jax
    from audio_motion_avatar_tpu.utils.lpips import LPIPSLoss
    lp = LPIPSLoss(image_hw=(32, 32))
    a = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.3 * np.random.RandomState(1).randn(1, 32, 32, 3), 0, 1).astype(np.float32)
    assert float(lp(a, a)) < 1e-6
    assert float(lp(a, b)) > 1e-4
    assert not lp.pretrained  # no weights in this image


def test_untrained_fallback_warns_loudly():
    """No Wav2Vec2 asset -> the extractor must WARN that features are noise
    (round-1 verdict: the silent fallback poisoned stage-2 semantics)."""
    import warnings
    from audio_motion_avatar_tpu.models.audio_encoder import AudioFeatureExtractor
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        AudioFeatureExtractor(model_path=None, dim=16)
    assert any("UNTRAINED" in str(x.message) for x in w)
