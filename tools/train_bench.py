"""Full-scale train-step timing on the attached chip.

Usage:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/train_bench.py [stage1|stage2]

Reproduces the round-1 "full scale" configuration (BASELINE.md): bs 1,
512x512, full synthetic SMPLX body (10475 verts), subdivide_steps 2
(30k gaussians), PTv3 refiner ON, remat, bf16 compute; stage 1 adds 4
novel-view renders, stage 2 the 6-frame audio rollout + render.

Timing methodology (verify skill): the jitted step is dispatched a few
times with a host-transfer fence (float(loss)) after each; the axon relay
does not reliably honor block_until_ready.
"""

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


def build_stage1(batch: int = 1):
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from audio_motion_avatar_tpu.training import stage1
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer)
    import dataclasses

    cfg = dataclasses.replace(AvatarConfig(), image_size=(512, 512),
                              compute_dtype="bfloat16")
    smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    model = TriplaneGaussianAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                                   point_refiner=build_point_refiner(cfg))

    ref = make_batch(batch, 1, (512, 512), seed=1)
    test = make_batch(batch, 4, (512, 512), seed=2)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
    ref, test = jx(ref), jx(test)
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = unbox(variables)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"[bench] stage1 params: {n_params/1e6:.1f}M")
    tx = make_optimizer(OptimConfig(learning_rate=5e-5, total_steps=1000))
    state = TrainState.create(params, tx)
    step = stage1.make_train_step(model, statics, cfg)
    return step, state, (ref, test)


def build_stage2(batch: int = 1):
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.audio_avatar import AudioDrivenAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    from audio_motion_avatar_tpu.training import stage2
    from audio_motion_avatar_tpu.training.train_state import (
        OptimConfig, TrainState, make_optimizer)
    import dataclasses

    cfg = dataclasses.replace(AvatarConfig(), image_size=(512, 512),
                              compute_dtype="bfloat16")
    smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    model = AudioDrivenAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                              point_refiner=build_point_refiner(cfg))
    ref = make_batch(batch, cfg.triplane_input_frames, (512, 512), seed=1)
    tgt = make_batch(batch, cfg.triplane_output_frames, (512, 512), seed=2,
                     with_audio=True, audio_dim=cfg.audio_feature_dim)
    jx = lambda b: jax.tree_util.tree_map(jnp.asarray, b)
    ref, tgt = jx(ref), jx(tgt)
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms, tgt.audio_features,
                           tgt.cam_parms)
    params = unbox(variables)["params"]
    tx = make_optimizer(OptimConfig(learning_rate=1e-4, total_steps=1000))
    state = TrainState.create(params, tx)
    step = stage2.make_train_step(model, statics, cfg)
    S = 3 * cfg.triplane_resolution ** 2
    zt = jnp.zeros((batch, cfg.triplane_input_frames,
                    cfg.triplane_feature_dim, S))
    zs = jnp.zeros((batch, cfg.triplane_input_frames, cfg.smpl_token_dim,
                    cfg.smpl_token_len))
    flag = jnp.zeros((batch,))
    return step, state, (ref, tgt, zt, zs, flag)


def main():
    argv = [a for a in sys.argv[1:]]
    batch = 1
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        del argv[i:i + 2]
    which = argv[0] if argv else "stage1"
    import jax
    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()} "
          f"batch={batch}")
    if which == "stage1":
        step, state, args = build_stage1(batch)
    else:
        step, state, args = build_stage2(batch)

    # step FLOPs from the compiled executable (XLA's own count) -> MFU
    flops = None
    try:
        cost = step.lower(state, *args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis is best-effort on axon
        print(f"[bench] cost_analysis unavailable: {e}")

    def run_step(state):
        out = step(state, *args)
        # stage-2's step also returns the predicted tokens (cache curriculum)
        return out[0], out[1]

    t0 = time.time()
    state, metrics = run_step(state)
    fence = float(metrics["loss"])
    print(f"[bench] compile+first step: {time.time()-t0:.1f}s loss={fence:.4f}")

    times = []
    for _ in range(4):
        t0 = time.time()
        state, metrics = run_step(state)
        fence = float(metrics["loss"])  # host-transfer fence
        times.append(time.time() - t0)
    t = float(np.median(times))
    V5E_BF16_PEAK = 197e12  # one v5e chip, bf16
    mfu = (flops / t / V5E_BF16_PEAK) if flops else None
    print(f"[bench] {which} train step: {t:.3f}s/step (median of 4, "
          f"times={['%.3f' % x for x in times]})")
    if flops:
        print(f"[bench] {which} step FLOPs (XLA-counted): {flops/1e12:.2f}T "
              f"-> MFU {100*mfu:.1f}% of v5e bf16 peak")


if __name__ == "__main__":
    main()
