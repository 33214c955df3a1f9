"""Stage-1 single-forward timing on the attached chip (VERDICT r2 #7).

The reference demo runs ONE stage-1 pass (Sapiens-1B ViT at 1024^2 + the
triplane/fusion/render stack) to produce the initial tokens before the
audio rollout streams (reference src/main2.py:172-177). bench.py measures
the streaming rollout only; this tool measures that cold-start pass so the
honest "cold-start + streaming" e2e number can be reported in BASELINE.md.

Usage:
  python tools/stage1_bench.py [--vit-only] [--image-size 1024] [--reps 3]

--vit-only times just the frozen Sapiens-1B ViT forward (40L x 1536w,
4096 tokens, bf16, flash attention path) — the dominant cost.
"""

import argparse
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


def run_vit(image_size: int, reps: int):
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.image_encoder import SapiensEncoder

    enc = SapiensEncoder(resolution=image_size, compute_dtype=jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0)
                      .rand(1, 3, image_size, image_size).astype(np.float32))
    print("[stage1_bench] init ViT (Sapiens-1B geometry)...", flush=True)
    variables = enc.init(jax.random.PRNGKey(0), img)
    fwd = jax.jit(lambda v, x: enc.apply(v, x))
    t0 = time.time()
    out = fwd(variables, img)
    fence = float(out.mean())
    print(f"[stage1_bench] compile+first: {time.time() - t0:.1f}s "
          f"out={out.shape} fence={fence:.4f}", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.time()
        fence = float(fwd(variables, img).mean())
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1e3
    print(json.dumps({"metric": "sapiens_1b_vit_forward",
                      "image_size": image_size, "ms": round(ms, 1)}))
    return ms


def run_full(image_size: int, reps: int):
    """Full stage-1 forward (the demo's init pass): ViT + feature pyramid +
    triplane encoder + fusion + renderer at the serving profile."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox

    cfg = dataclasses.replace(
        AvatarConfig(), image_size=(image_size, image_size),
        compute_dtype="bfloat16", frames_scan_remat=False,
        upsampler_sparse=True, upsampler_sparse_max_tiles=256,
        sample_quad=True, upsampler_upconv="dilated",
        splat_segmented=True, audio_transformer_remat=False)
    smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    model = TriplaneGaussianAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                                   point_refiner=build_point_refiner(cfg))
    # demo init pass: B=2 interleaved streams, T=2 reference frames each
    ref = make_batch(2, 2, (image_size, image_size), seed=1)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
    ref = jx(ref)
    print("[stage1_bench] init full stage-1...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]

    @jax.jit
    def fwd(params, video, smpl, cam):
        out = model.apply({"params": params}, statics, video, smpl, cam)
        return out.triplane_tokens.mean() + out.smpl_tokens.mean()

    cam = ref.cam_parms
    t0 = time.time()
    fence = float(fwd(params, ref.video, ref.smpl_parms, cam))
    print(f"[stage1_bench] compile+first: {time.time() - t0:.1f}s "
          f"fence={fence:.4f}", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.time()
        fence = float(fwd(params, ref.video, ref.smpl_parms, cam))
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1e3
    print(json.dumps({"metric": "stage1_demo_init_forward",
                      "image_size": image_size, "batch": [2, 2],
                      "ms": round(ms, 1)}))
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vit-only", action="store_true")
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    if a.vit_only:
        run_vit(a.image_size, a.reps)
    else:
        run_full(a.image_size, a.reps)


if __name__ == "__main__":
    main()
