#!/bin/bash
# Round-3 TPU measurement queue, phase 3 (run after r3_queue2.sh):
#   1. VPU transcendental probe — is exp2 cheaper than exp? (decides
#      whether a custom exp2 flash kernel can beat 2.85 ms/layer-step)
#   2. fused 2-chunk serving rollout at the prod_affine config — pays the
#      ~24 ms/rollout dispatch idle once per 2 chunks (exactness pinned by
#      tests/test_serve_fuse.py)
#   3. official bench.py with the affine (released-ckpt parity) config —
#      refreshes .bench_cache with the new production number
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 1800 python tools/vpu_probe.py 2>&1 | tee /tmp/vpu_probe.log

# attn probe re-run: picks up the serve-kernel variants (most stock
# variants hit the compile cache from the 03:12 run)
timeout 3600 python tools/attn_probe.py --batch 2 2>&1 | tee /tmp/attn_probe2.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --fuse-chunks 2 \
  --set 'sample_quad=true,splat_large_cap=2048,upsampler_norm=affine' \
  2>&1 | tee /tmp/serve_fuse2.log

# serve-attention e2e variant (kernel measured standalone by attn_probe2;
# this confirms in-graph) + cap-192 on the new base for the knob table
timeout 10800 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated \
  --sweep 'prod_serveattn:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,audio_attn_impl=serve;prod_quadpallas:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas;prod_serve_quadp:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,audio_attn_impl=serve,quad_builder=pallas' \
  2>&1 | tee /tmp/sweep_serveattn.log

timeout 7200 python bench.py 2>&1 | tee /tmp/bench_r3.log

# refiner dec0-MLP isolation (erf-gelu fusion hypothesis)
timeout 3600 python tools/refiner_probe.py 2>&1 | tee /tmp/refiner_probe2.log

# overfit convergence rerun: neutral-pose subject (live gradient from
# step 0 — the posed-subject run collapsed to all-white, see
# tools/overfit_bench.py docstring), lr 2e-4
timeout 5400 python tools/overfit_bench.py --steps 600 --eval-every 20 \
  --dump-dir /tmp/overfit_dumps2 2>&1 | tee /tmp/overfit2.log

# training MFU scaling with batch (bs1 is latency-bound — show the knee)
timeout 3600 python tools/train_bench.py stage1 --batch 2 2>&1 | tee /tmp/train_s1_b2.log
timeout 3600 python tools/train_bench.py stage2 --batch 2 2>&1 | tee /tmp/train_s2_b2.log

echo QUEUE3_DONE
