#!/bin/bash
# Round-3 TPU measurement queue, phase 2 (run after r3_queue.sh):
#   1. affine-norm serving sweep — the released-ckpt demo semantics
#      (torch import folds BN -> affine; GN stats cost ~60 ms/rollout on
#      the dense 256-res level, xprof_prod 2026-08-18)
#   2. flash-attention block sweep at the serving shape (B=2, S=6304)
#   3. stage-1 overfit convergence curve (VERDICT r2 #10)
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# phase-1 retries (tool bugs fixed: stage2 step 4-tuple, compute_dtype
# kwarg, AvatarOutput.triplane_tokens field name)
timeout 3600 python tools/train_bench.py stage2 2>&1 | tee /tmp/train_s2.log
timeout 3600 python tools/stage1_bench.py --vit-only 2>&1 | tee /tmp/s1_vit.log
timeout 3600 python tools/stage1_bench.py 2>&1 | tee /tmp/s1_full.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --trace-out /tmp/xprof_affine \
  --sweep 'prod_affine:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine;prod_affine_c192:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,upsampler_sparse_max_tiles=192' \
  2>&1 | tee /tmp/sweep_affine.log

timeout 3600 python tools/attn_probe.py --batch 2 2>&1 | tee /tmp/attn_probe.log

timeout 3600 python tools/overfit_bench.py --steps 400 --eval-every 20 \
  --dump-dir /tmp/overfit_dumps 2>&1 | tee /tmp/overfit.log

echo QUEUE2_DONE
