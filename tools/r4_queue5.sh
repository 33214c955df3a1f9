#!/bin/bash
# Round-4 TPU queue, phase 5: xprof the 21.77-fps production program to
# find the next bucket; refresh the official bench number; MFU bs4 rows.
while [ -f /tmp/r4dbg2.pid ] && kill -0 $(cat /tmp/r4dbg2.pid) 2>/dev/null; do sleep 60; done
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --trace-out /tmp/xprof_r4prod \
  --sweep 'prod_r4:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true' \
  2>&1 | tee /tmp/sweep_r4prod.log

timeout 3600 python tools/xprof_trace.py --analyze-only --out /tmp/xprof_r4prod \
  2>&1 | tee /tmp/xprof_r4prod.log

timeout 7200 python bench.py 2>&1 | tee /tmp/bench_r4b.log

timeout 3600 python tools/train_bench.py stage1 --batch 4 2>&1 | tee /tmp/train_s1_b4.log
timeout 3600 python tools/train_bench.py stage2 --batch 4 2>&1 | tee /tmp/train_s2_b4.log

echo R4_QUEUE5_DONE
