#!/bin/bash
# Round-4 TPU queue, phase 6: the exp2 flash fork (ops/flash2.py).
# 1) per-layer stock-vs-fork timing + maxdiff at the serving shape,
# 2) e2e sweep prod vs prod+flash2 (unfused, shared init),
# 3) fused 2-chunk run with flash2 (the bench.py candidate config).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 1800 python tools/attn_probe.py --batch 2 --exp2-only --iters 20 \
  2>&1 | tee /tmp/attn_exp2.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated \
  --sweep 'prod_r4:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true;prod_r4_flash2:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true,audio_attn_impl=flash2' \
  2>&1 | tee /tmp/sweep_flash2.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --fuse-chunks 2 \
  --set 'sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true,audio_attn_impl=flash2' \
  2>&1 | tee /tmp/serve_fuse_flash2.log

echo R4_QUEUE6_DONE
