"""Serving roofline: per-component floors for the two biggest remaining
xprof buckets — the audio transformer (~197 ms/rollout) and the PTv3 point
refiner (~86 ms) — plus an empirical VPU transcendental rate so the
attention floor accounts for softmax exp, not just MXU/HBM.

Complements tools/roofline.py (upsampler) to complete the per-component
ceiling-proof table (VERDICT r3 next-round #1): for each component,
    floor_ms = max(flops/MXU_peak, bytes/HBM_peak, exp_count/VPU_exp_rate)
    attainment = floor / measured.
XLA's cost analysis supplies flops / bytes / transcendentals; the exp rate
is measured on-device (jnp.exp on a serving-sized bf16 tensor).

One JSON line per row + a markdown table on stderr for BASELINE.md.
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
import jax
import jax.numpy as jnp

from tools.roofline import MXU_PEAK, HBM_PEAK, measure, cost


def full_cost(fn, args):
    """(flops, bytes, transcendentals) from XLA's cost analysis."""
    an = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(an, (list, tuple)):
        an = an[0]
    return (float(an.get("flops", 0.0)),
            float(an.get("bytes accessed", 0.0)),
            float(an.get("transcendentals", 0.0)))


def measure_exp_rate(iters=8):
    """MARGINAL exp throughput (elements/s): exp-pass time minus a
    same-shape mul-pass time, so the HBM traffic both pay cancels and what
    remains approximates the extra VPU work of exp. Still an upper bound
    on fused-kernel exp cost (VMEM-resident operands overlap better)."""
    x = jnp.asarray(np.random.RandomState(0).randn(16, 1280, 1280)
                    .astype(np.float32)).astype(jnp.bfloat16)
    n = x.size

    def timed(op):
        @jax.jit
        def loop(x):
            def body(i, acc):
                return acc + op(x + (1e-6 * i).astype(x.dtype)).mean() \
                    .astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        float(loop(x))
        t0 = time.time()
        float(loop(x))
        return (time.time() - t0) / iters

    dt = max(timed(jnp.exp) - timed(lambda t: t * 1.0001), 1e-9)
    return n / dt


def row(name, ms, fl, by, tr, exp_rate):
    t_mxu = fl / MXU_PEAK * 1e3
    t_hbm = by / HBM_PEAK * 1e3
    # NB: the MXU/HBM max is the only defensible FLOOR. A transcendental
    # "floor" from a standalone-exp measurement is wrong by construction:
    # tools/vpu_probe shows standalone elementwise ops are HBM-BOUND on
    # this chip (mul 1.62 ms vs exp 2.55 ms on the same 41M-elem block —
    # only 1.6x apart), so that rate reflects memory traffic the fused
    # kernel never pays; inside a flash kernel the operand lives in VMEM
    # and exp runs at the true VPU rate, which this probe cannot see.
    # Transcendental counts are reported as context, with an upper-bound
    # cost at the measured exp-minus-mul marginal rate.
    floor = max(t_mxu, t_hbm)
    bound = "compute" if t_mxu >= t_hbm else "memory"
    t_vpu_ub = (tr / exp_rate * 1e3) if exp_rate else 0.0
    r = {"component": name, "ms": round(ms, 2),
         "gflop": round(fl / 1e9, 1), "gbytes": round(by / 1e9, 2),
         "g_transc": round(tr / 1e9, 2),
         "floor_ms": round(floor, 2), "bound": bound,
         "mxu_ms": round(t_mxu, 2), "hbm_ms": round(t_hbm, 2),
         "vpu_exp_upper_bound_ms": round(t_vpu_ub, 2),
         "attainment_pct": round(100.0 * floor / ms, 1) if ms else 0.0}
    print(json.dumps(r), flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=12,
                    help="refiner frames per rollout (2 streams x 6)")
    a = ap.parse_args()

    import dataclasses
    from audio_motion_avatar_tpu.models.audio_net import AudioTriplaneNet
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.parallel.mesh import unbox

    cfg = dataclasses.replace(AvatarConfig(), compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    rows = []

    exp_rate = measure_exp_rate()
    print(json.dumps({"vpu_exp_rate_gelem_s": round(exp_rate / 1e9, 2)}),
          flush=True)

    # ---- audio transformer: the full 6-step AR rollout at serving dims,
    # serving config (remat off, flash attention) ----
    net = AudioTriplaneNet(
        feature_dim=cfg.triplane_feature_dim,
        triplane_resolution=cfg.triplane_resolution,
        smpl_token_len=cfg.smpl_token_len,
        input_frames=cfg.triplane_input_frames,
        output_frames=cfg.triplane_output_frames,
        layers=cfg.audio_transformer_layers,
        head_dim=cfg.audio_transformer_head_dim,
        heads=cfg.audio_transformer_num_heads,
        audio_feature_dim=cfg.audio_feature_dim,
        compute_dtype=jnp.bfloat16, remat=False)
    B = a.batch
    S_tri = 3 * cfg.triplane_resolution ** 2
    tri = jnp.asarray(rng.randn(B, cfg.triplane_input_frames,
                                cfg.triplane_feature_dim, S_tri)
                      .astype(np.float32))
    smpl = jnp.asarray(rng.randn(B, cfg.triplane_input_frames,
                                 cfg.smpl_token_dim, cfg.smpl_token_len)
                       .astype(np.float32))
    aud = jnp.asarray(rng.randn(B, cfg.triplane_output_frames,
                                cfg.audio_feature_dim).astype(np.float32))
    v = unbox(net.init(jax.random.PRNGKey(0), aud, tri, smpl))

    def audio_fn(aud_, tri_, smpl_):
        o_tri, o_smpl = net.apply(v, aud_, tri_, smpl_)
        return o_tri.astype(jnp.float32).mean() + \
            o_smpl.astype(jnp.float32).mean()

    ms = measure(audio_fn, (aud, tri, smpl), a.iters)
    fl, by, tr = full_cost(audio_fn, (aud, tri, smpl))
    rows.append(row("audio transformer (6-step AR rollout, B=2)",
                    ms, fl, by, tr, exp_rate))

    # ---- PTv3 refiner at serving shape ----
    refiner = build_point_refiner(cfg)
    pts = jnp.asarray(rng.randn(a.frames, 30720, 3).astype(np.float32) * 0.4)
    feats = jnp.asarray(rng.randn(a.frames, 30720, 3 * cfg.triplane_feature_dim)
                        .astype(np.float32)).astype(jnp.bfloat16)
    vr = unbox(refiner.init(jax.random.PRNGKey(1), pts[:1], feats[:1]))

    def ref_fn(p, f):
        return refiner.apply(vr, p, f).astype(jnp.float32).mean()[None]

    ms = measure(ref_fn, (pts, feats), a.iters)
    fl, by, tr = full_cost(ref_fn, (pts, feats))
    rows.append(row(f"PTv3 refiner ({a.frames}x30720 pts)", ms, fl, by, tr,
                    exp_rate))

    print("\n| component | ms | GFLOP | GB | G-transc | floor ms | bound | "
          "attainment |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['component']} | {r['ms']} | {r['gflop']} | "
              f"{r['gbytes']} | {r['g_transc']} | {r['floor_ms']} | "
              f"{r['bound']} | {r['attainment_pct']}% |", file=sys.stderr)


if __name__ == "__main__":
    main()
