#!/bin/bash
# Round-4 TPU queue, phase 3 (after r4_queue2): the ceiling-proof probes.
#   1. serve_roofline — audio transformer + PTv3 refiner floors (MXU/HBM/
#      VPU-exp) for the per-component roofline table
#   2. vpu_probe — exp vs exp2 rate (never ran in r3; decides whether an
#      exp2 softmax kernel is worth building)
# Waits for r4_queue2 to finish first (single chip).
while [ -f /tmp/r4q2.pid ] && kill -0 $(cat /tmp/r4q2.pid) 2>/dev/null; do
  sleep 60
done
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

timeout 5400 python tools/serve_roofline.py 2>&1 | tee /tmp/serve_roofline_r4.log
timeout 1800 python tools/vpu_probe.py 2>&1 | tee /tmp/vpu_probe_r4.log

echo R4_QUEUE3_DONE
