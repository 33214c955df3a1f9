#!/bin/bash
# Round-4 TPU queue, phase 4: the gelu_approx serving lever (erf -> tanh
# in the PTv3 refiner MLPs + audio GEGLU; refiner_probe measured erf at
# ~1.7x the MLP matmul time on the VPU). Sweep on the unfused pallas-quad
# base (comparable to 20.25), then a fused run if it wins.
while [ -f /tmp/r4dbg.pid ] && kill -0 $(cat /tmp/r4dbg.pid) 2>/dev/null; do sleep 60; done
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated \
  --sweep 'prod_qp:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas;prod_qp_gelutanh:sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true' \
  2>&1 | tee /tmp/sweep_gelu.log

timeout 7200 python tools/serve_bench.py --sparse --sparse-cap 256 \
  --upconv dilated --fuse-chunks 2 \
  --set 'sample_quad=true,splat_large_cap=2048,upsampler_norm=affine,quad_builder=pallas,gelu_approx=true' \
  2>&1 | tee /tmp/serve_fuse_gelu.log

echo R4_QUEUE4_DONE
