#!/bin/bash
# Round-4 TPU queue, phase 2 (after r4_queue1):
#   1. official bench.py at the new production config (pallas quad builder
#      + fused 2-chunk rollout) — compile cache warm from queue1
#   2. train-step MFU at batch 2 (both stages) — the MFU-vs-batch rows
#   3. full-dim overfit convergence curve (512px, 600 steps)
#   4. PTv3 refiner dec0-MLP isolation probe (erf-gelu dot-fusion hypothesis)
#   5. upsampler roofline table (VERDICT r3 #6 closing artifact)
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 7200 python bench.py 2>&1 | tee /tmp/bench_r4.log

timeout 3600 python tools/train_bench.py stage1 --batch 2 2>&1 | tee /tmp/train_s1_b2.log
timeout 3600 python tools/train_bench.py stage2 --batch 2 2>&1 | tee /tmp/train_s2_b2.log

timeout 7200 python tools/overfit_bench.py --steps 600 --eval-every 20 \
  --dump-dir /tmp/overfit_dumps_r4 2>&1 | tee /tmp/overfit_r4.log

timeout 3600 python tools/refiner_probe.py 2>&1 | tee /tmp/refiner_probe_r4.log

timeout 5400 python tools/roofline.py 2>&1 | tee /tmp/roofline_r4.log

echo R4_QUEUE2_DONE
