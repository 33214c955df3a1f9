"""Benchmark: END-TO-END serving throughput on one TPU chip.

PRIMARY metric (the north star, BASELINE.md): audio features -> rendered
512x512 avatar frames through the EXACT stage-2 serving program — the
AudioTriplaneNet AR rollout (8L x 6 steps, flash attention), shared SMPLX
decoder, triplane upsampler 32->512, SMPLX FK/LBS + subdivision to 30k
gaussians, bilinear triplane sampling x2, PTv3 point refiner, gaussian
heads, and the Pallas tile splat — at full reference dims, bf16 compute.

Reference demo semantics (src/main2.py:159-319): TWO interleaved frame
streams, 6-frame chunks each; our demo batches both streams as B=2 through
one compiled rollout, so the output video rate is (2*6) frames per rollout.
fps = 12 / rollout seconds, fenced by host transfers (block_until_ready is
unreliable through the axon relay; float() forces the sync).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline = fps / 25 (driver-set north star; the reference publishes no
numbers — BASELINE.md). Falls back to the round-1 splat microbench if the
full pipeline cannot run (e.g. no TPU attached).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_FPS = 25.0


def e2e_serving():
    # sparse-tile final upsample level (cap 256 of 1024 tiles; a human body
    # projection covers 11-18% + halo — measured): 13.1 vs 11.9 fps dense,
    # exact where covered (GroupNorm stats over covered tiles, see
    # models/upsampler.py)
    from tools.serve_bench import run
    res = run(batch=2, frames_per_chunk=6, ablate="none", reps=3,
              image_size=(512, 512), sparse=True, sparse_cap=256,
              sample_quad=True)
    return {
        "metric": "e2e_audio_to_512px_avatar",
        "value": round(res["fps"], 2),
        "unit": "fps",
        "vs_baseline": round(res["fps"] / NORTH_STAR_FPS, 3),
    }


def splat_microbench():
    """Round-1 fallback: the splat kernel alone (30k gaussians, 512^2)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import splat, splat_pallas
    from audio_motion_avatar_tpu.ops.cameras import make_camera

    N, W, H, FRAMES = 30000, 512, 512, 20
    rng = np.random.RandomState(0)
    xyz = jnp.asarray((rng.randn(N, 3) * np.array([0.25, 0.6, 0.15])).astype(np.float32))
    rot = rng.randn(N, 4).astype(np.float32)
    rot[:, 0] += 3.0
    rot = jnp.asarray(rot)
    raw_s = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.3)
    raw_o = jnp.asarray(rng.randn(N).astype(np.float32))
    col = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    E = jnp.eye(4).at[2, 3].set(2.5)
    cam = make_camera(K, E, W, H)

    @jax.jit
    def render_frames(xyz, raw_s, raw_o, col):
        def body(i, acc):
            proj = splat.project_gaussians(
                xyz + 1e-4 * i, rot, splat.activate_scales(raw_s),
                splat.activate_opacity(raw_o), col, cam)
            img = splat_pallas.render_tiles_pallas(
                proj, W, H, max_per_tile=256, max_window=4)
            return acc + img.mean()

        return jax.lax.fori_loop(0, FRAMES, body, 0.0)

    float(render_frames(xyz, raw_s, raw_o, col))  # compile + sync
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        float(render_frames(xyz, raw_s, raw_o, col))
    dt = (time.time() - t0) / (reps * FRAMES)
    return {
        "metric": "splat_render_30k_gaussians_512px",
        "value": round(1.0 / dt, 2),
        "unit": "fps",
        "vs_baseline": round((1.0 / dt) / NORTH_STAR_FPS, 3),
    }


def _probe_device(timeout_s: int = 600):
    """A relay outage makes backend init HANG inside a C-level RPC — a
    SIGALRM handler never runs (verified live), so probe a trivial op in a
    SUBPROCESS with a hard timeout. 600s covers post-kill chip wedge
    recovery (~190s observed)."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp; print(float(jnp.ones(8).sum()))"],
        timeout=timeout_s, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"device probe failed: {r.stderr[-300:]}")


def main():
    try:
        _probe_device()
    except BaseException as e:  # noqa: BLE001 — relay down/hung: nothing
        # below can run (any device op would block forever), so emit the
        # zero metric immediately
        print(f"[bench] device probe failed ({type(e).__name__}: {e}); "
              "emitting zero metric", file=sys.stderr)
        print(json.dumps({"metric": "e2e_audio_to_512px_avatar",
                          "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: device unavailable"}))
        return
    try:
        out = e2e_serving()
    except Exception as e:  # noqa: BLE001 — emit SOMETHING for the driver
        print(f"[bench] e2e path failed ({type(e).__name__}: {e}); "
              "falling back to splat microbench", file=sys.stderr)
        try:
            out = splat_microbench()
        except Exception as e2:  # noqa: BLE001 — device/relay down entirely
            print(f"[bench] splat microbench also failed "
                  f"({type(e2).__name__}: {e2}); emitting zero metric",
                  file=sys.stderr)
            out = {"metric": "e2e_audio_to_512px_avatar", "value": 0.0,
                   "unit": "fps", "vs_baseline": 0.0,
                   "error": f"{type(e2).__name__}: device unavailable"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
