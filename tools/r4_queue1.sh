#!/bin/bash
# Round-4 TPU measurement queue, phase 1: the landed-but-unmeasured
# serving levers (VERDICT r3 next-round #1).
#   1. shared-init sweep: prod_affine base (re-measure) vs the FIXED
#      Pallas one-pass quad builder (round-3's run died on a Mosaic
#      gather in the index map; fixed 2026-08-19, bit-exact on-chip)
#      + the cap-192 knob on top of the winner
#   2. fused 2-chunk rollout (in-graph window slide) on the winner's cfg
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated \
  --sweep 'prod_affine:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine;prod_quadpallas:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas' \
  2>&1 | tee /tmp/sweep_r4a.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --fuse-chunks 2 \
  --set 'sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas' \
  2>&1 | tee /tmp/serve_fuse_r4.log

echo R4_QUEUE1_DONE
