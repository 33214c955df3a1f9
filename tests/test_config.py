import os

import pytest

from audio_motion_avatar_tpu.configs import ConfigLoader
from audio_motion_avatar_tpu.configs.build import (build_avatar_config,
                                                   build_optim_config)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "audio_motion_avatar_tpu", "configs")


def load(name, overrides=None):
    return ConfigLoader.load_config(os.path.join(CFG_DIR, name), overrides)


def test_defaults_merge_stage1():
    cfg = load("config_stage_1.yaml")
    assert cfg.dataset.name == "thuman"
    assert cfg.model.triplane_net.triplane_resolution == 32
    assert cfg.training.batch_size == 1
    assert cfg.experiment_name == "triplane_reconstruction"


def test_interpolation_cross_file():
    cfg = load("config_stage_1.yaml")
    # renderer pulls from triplane_net / dataset via ${}
    assert cfg.model.renderer.triplane_feature_dim == 256
    assert cfg.model.renderer.image_size == [1024, 1024]
    assert cfg.model.triplane_net.image_feature_dim == 1536
    assert cfg.model.triplane_net.flat_hand_mean is False


def test_arithmetic_expression():
    cfg = load("config_stage_1.yaml")
    # ptv3 _input_dim: "${model.triplane_net.triplane_feature_dim}*3"
    assert cfg.model.ptv3_encoder.input_dim == 768


def test_self_override_in_stage2():
    cfg = load("config_stage_2.yaml")
    # _self_ section flips sample_feature off (config_stage_2.yaml)
    assert cfg.model.triplane_net.sample_feature is False
    assert cfg.dataset.name == "ted_speech"
    assert cfg.model.triplane_audio_net.audio_feature_dim == 768


def test_cli_overrides():
    cfg = load("config_stage_1.yaml",
               overrides=["training.batch_size=4",
                          "model.triplane_net.radius=2.0",
                          "training.fast_dev_run=true"])
    assert cfg.training.batch_size == 4
    assert cfg.model.triplane_net.radius == 2.0
    assert cfg.training.fast_dev_run is True


def test_build_avatar_config():
    cfg = load("config_stage_1.yaml")
    ac = build_avatar_config(cfg)
    assert ac.triplane_resolution == 32
    assert ac.image_size == (1024, 1024)
    assert ac.flat_hand_mean is False
    assert ac.ptv3_enc_channels == (32, 64, 128, 256, 512)


def test_build_optim_config():
    cfg = load("config_stage_1.yaml")
    oc = build_optim_config(cfg)
    assert oc.learning_rate == pytest.approx(5e-5)
    assert oc.accumulate_steps == 4
    assert oc.total_steps == 50000


def test_tiny_profile():
    cfg = load("config_tiny.yaml")
    ac = build_avatar_config(cfg)
    assert ac.triplane_resolution == 8
    assert cfg.training.fast_dev_run is True


@pytest.mark.quick
def test_apply_serving_profile_respects_yaml_overrides():
    """SERVING_PROFILE fills inference knobs, but any knob the YAML names
    explicitly must win (configs/build.py:apply_serving_profile)."""
    from audio_motion_avatar_tpu.configs import ConfigLoader
    from audio_motion_avatar_tpu.configs.build import (SERVING_PROFILE,
                                                       apply_serving_profile,
                                                       build_avatar_config)
    import os
    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "audio_motion_avatar_tpu", "configs",
                            "config_tiny.yaml")
    cfg = ConfigLoader.load_config(
        cfg_path, ["model.renderer.upsampler_sparse_max_tiles=99"])
    ac = build_avatar_config(cfg)
    out = apply_serving_profile(ac, cfg)
    # profile-applied knobs
    assert out.upsampler_sparse is True
    assert out.sample_quad is True
    assert out.splat_segmented is True
    assert out.frames_scan_remat is False
    # YAML-named knob wins over the profile's 256
    assert out.upsampler_sparse_max_tiles == 99
    # training-side config untouched
    assert ac.upsampler_sparse is False or ac.upsampler_sparse == out.upsampler_sparse
