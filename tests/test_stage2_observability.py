"""Stage-2 training observability parity (VERDICT r3 Missing #3).

The reference's stage-2 training_step logs per-cache-depth l1 channels
(NaN-filled, lightning_model_wrapper.py:498-508), TB scalars (:524-534),
and dumps audio-rendered + ref comparison PNGs (:536-570). A main2
fast_dev_run must produce TB event files and both comparison images.
"""

import glob
import os

import numpy as np
import pytest


def test_cache_depth_channels():
    from audio_motion_avatar_tpu.training.stage2 import cache_depth_channels
    ch = cache_depth_channels(0.5, 1)
    assert np.isnan(ch["l1_loss_no_cache"])
    assert ch["l1_loss_cache_1"] == 0.5
    assert np.isnan(ch["l1_loss_cache_2"])
    # depth > 2: every channel NaN (reference suffix_dict covers 0..2)
    assert all(np.isnan(v) for v in cache_depth_channels(0.5, 5).values())


@pytest.mark.slow
def test_main2_fast_dev_run_writes_tb_and_images(tmp_path):
    from audio_motion_avatar_tpu.main2 import main
    out = str(tmp_path / "out")
    main(["--config", "audio_motion_avatar_tpu/configs/config_tiny.yaml",
          "--mode", "train",
          f"training.output_dir={out}",
          "training.fast_dev_run=true",
          "training.cache_replacement_prob=0.5"])
    events = glob.glob(os.path.join(out, "tb", "events.out.tfevents.*"))
    assert events, "no TensorBoard event files written"
    audio_pngs = glob.glob(os.path.join(out, "audio_rendered_images",
                                        "audio_comparison_*_iter*.png"))
    assert audio_pngs, "no audio comparison dump written"
    ref_pngs = glob.glob(os.path.join(out, "audio_rendered_images",
                                      "ref_comparison_*.png"))
    assert ref_pngs, "no ref comparison dump written"
