#!/bin/sh
# Regenerate the trained tiny-profile checkpoint fixture that the golden
# demo gate renders from (tests/test_demo_golden.py, VERDICT r4 #7).
#
# Trains the tiny stage-2 profile (synthetic clip, CPU) through the real
# main2 train entry — AR rollout + cache curriculum + checkpoint top-k —
# then installs the checkpoint dir as tests/fixtures/demo_tiny_ckpt and
# regenerates the golden frames from it.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tiny2_train}
python -c "
import jax
jax.config.update('jax_platforms','cpu')
from audio_motion_avatar_tpu import main2
main2.main(['--config','audio_motion_avatar_tpu/configs/config_tiny.yaml',
 '--mode','train','training.fast_dev_run=false','training.max_epochs=40',
 'training.total_steps=320','dataset.render_gt=true',
 'training.output_dir=$OUT'])
"
rm -rf tests/fixtures/demo_tiny_ckpt
cp -r "$OUT/checkpoints" tests/fixtures/demo_tiny_ckpt
REGEN_DEMO_GOLDEN=1 python -m pytest tests/test_demo_golden.py -q -k match_golden
python -m pytest tests/test_demo_golden.py -q
