"""VPU transcendental microbench: is exp2 cheaper than exp on this chip?

Motivation: the serving flash-attention kernel at (B=2, H=8, S=6400, D=64)
measures 2.85 ms/layer-step while its MXU floor is ~1.3 ms — the gap is
consistent with the S^2 softmax `exp` running multi-cycle on the VPU
(655M exps/layer-step). If hardware exp2 is materially faster than exp,
a custom kernel computing exp(x) as exp2(x * log2(e)) recovers most of
the gap; if not, the stock kernel is at its floor and the audio
transformer is done. This probe measures both, plus the fused
multiply+exp2 form, at the exact softmax-block shape.

Also probes bf16-vs-f32 exp throughput (VPU elementwise rate doubles on
bf16 only if Mosaic packs lanes — measure, don't assume).

Usage: python tools/vpu_probe.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = float(np.log2(np.e))


def _bench(fn, x, reps=20):
    fn(x).block_until_ready()
    # fenced by host transfer (block_until_ready unreliable on axon relay)
    float(fn(x).ravel()[0])
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(x)
    float(out.ravel()[0])
    return (time.time() - t0) / reps * 1000.0


def _pallas_map(op, shape, dtype, block=(512, 512)):
    """One-op-per-element Pallas kernel so XLA can't fuse the timing away.
    2D grid of modest blocks (512x512 f32 = 1 MB — in+out double-buffered
    stays ~4 MB, well inside VMEM; a (256, 6400) block plan oversubscribed
    VMEM and wedged the remote compiler for 16+ min)."""

    def kernel(x_ref, o_ref):
        o_ref[:] = op(x_ref[:])

    rows, cols = shape
    br, bc = block

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            grid=(rows // br, cols // bc),
            in_specs=[pl.BlockSpec((br, bc), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(x)

    return jax.jit(run)


def main():
    print(f"[vpu_probe] backend={jax.default_backend()}", flush=True)
    shape = (6400, 6400)  # one layer-step's logits at B=2 merged: 41M elems
    n = shape[0] * shape[1]
    results = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            np.random.RandomState(0).randn(*shape) * 4.0, dtype=dtype)
        cases = {
            "exp": lambda t: jnp.exp(t),
            "exp2": lambda t: jnp.exp2(t),
            "exp2_scaled": lambda t: jnp.exp2(t * LOG2E),
            "mul": lambda t: t * 1.0001,  # baseline: pure VPU mul + stream
            "tanh": lambda t: jnp.tanh(t),
        }
        for name, op in cases.items():
            try:
                ms = _bench(_pallas_map(op, shape, dtype), x)
            except Exception as e:  # noqa: BLE001
                results[f"{name}_{dtype.__name__}"] = f"ERR {type(e).__name__}"
                continue
            gops = n / ms / 1e6
            results[f"{name}_{dtype.__name__}"] = round(ms, 3)
            print(json.dumps({"op": name, "dtype": dtype.__name__,
                              "ms": round(ms, 3),
                              "gelem_per_s": round(gops, 1)}), flush=True)
    print(json.dumps({"metric": "vpu_probe", **results}), flush=True)


if __name__ == "__main__":
    main()
