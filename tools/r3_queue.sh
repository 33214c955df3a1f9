#!/bin/bash
# Round-3 TPU measurement queue (serialize: 1 CPU, 1 chip).
# Run with: nohup bash tools/r3_queue.sh > /tmp/r3_queue.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. post-quad-fix production number + combo sweep (shared init)
timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --trace-out /tmp/xprof_prod \
  --sweep 'prod:sample_quad=true;prod_tier:sample_quad=true,splat_large_cap=2048;prod_c192:sample_quad=true,upsampler_sparse_max_tiles=192;prod_w2:sample_quad=true,splat_max_window=2' \
  2>&1 | tee /tmp/sweep_r3a.log

# 2. training step re-measures (VERDICT #4)
timeout 3600 python tools/train_bench.py stage1 2>&1 | tee /tmp/train_s1.log
timeout 3600 python tools/train_bench.py stage2 2>&1 | tee /tmp/train_s2.log

# 3. Sapiens ViT + full stage-1 cold-start (VERDICT #7)
timeout 3600 python tools/stage1_bench.py --vit-only 2>&1 | tee /tmp/s1_vit.log
timeout 3600 python tools/stage1_bench.py 2>&1 | tee /tmp/s1_full.log

# 4. official bench with everything landed
timeout 3600 python bench.py 2>&1 | tee /tmp/bench_r3b.log
echo QUEUE_DONE
