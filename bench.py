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

# sitecustomize imports jax before this file runs, so the env var above is
# too late by itself — bind the cache dir through jax.config (the actual
# cause of BENCH_r04's 327.8 s "cold" compile; VERDICT r4 weak #6).
from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

NORTH_STAR_FPS = 25.0


def e2e_serving():
    # sparse-tile final upsample level (cap 256 of 1024 tiles; a human body
    # projection covers 11-18% + halo — measured): 13.1 vs 11.9 fps dense,
    # exact where covered (GroupNorm stats over covered tiles, see
    # models/upsampler.py)
    from tools.serve_bench import run
    # upconv='dilated' (nearest2x+conv3x3 as ONE input-dilated conv): the
    # round-3 TPU sweep winner — 17.27 fps vs 16.19 quad/poly, with Winograd
    # a measured LOSS on-chip (14.83) despite the 2.25x MAC cut (sweep_p1,
    # 2026-08-18)
    # splat_large_cap=2048: two-tier binning, exact (18.09 vs 17.41 fps on
    # the r3 prod sweep 2026-08-18)
    # upsampler_norm='affine': the REFERENCE-PARITY serving configuration —
    # the released .ckpt runs BatchNorm in eval mode, i.e. per-channel
    # affine with folded running stats (reference renderer.py:348-366; our
    # torch importer folds them, training/torch_import._bn_affine, and
    # defaults upsampler_norm='affine' on import). GroupNorm is our
    # TRAINING-config norm (SPMD-clean, stat-free); serving a self-trained
    # GN checkpoint measures ~1.9 fps lower (19.26 affine vs 17.41 GN,
    # sweep_affine 2026-08-19) because GN pays stats reduce+normalize on
    # the dense 256-res level every frame.
    # quad_builder='pallas': the one-pass Pallas quad-row builder (fixed
    # 2026-08-19 — Mosaic rejected the gather the index map lowered to);
    # 20.25 vs 19.38 fps on the r4 shared-init sweep, bit-exact vs the XLA
    # build. fuse_chunks=2: two demo chunks in one program (in-graph window
    # slide, exactness pinned by tests/test_serve_fuse.py) — 20.55 fps.
    # gelu_approx: tanh gelu in the refiner MLPs + audio GEGLU — 21.56 vs
    # 20.32 fps (r4 sweep); quality-cleared by the production parity gate
    # (golden-frame test: within mean|diff| <= 1e-2 / PSNR >= 40 dB of the
    # exact-erf reference frames).
    res = run(batch=2, frames_per_chunk=6, ablate="none", reps=3,
              image_size=(512, 512), sparse=True, sparse_cap=256,
              sample_quad=True, upconv="dilated", splat_large_cap=2048,
              upsampler_norm="affine", fuse_chunks=2,
              quad_builder="pallas", gelu_approx=True)
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


CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache.json")


def _load_cache(path):
    try:
        with open(path) as f:
            out = json.load(f)
        if isinstance(out, dict) and "metric" in out and "value" in out:
            return out
    except (OSError, ValueError):
        pass
    return None


def _save_cache(out, path):
    try:
        with open(path, "w") as f:
            json.dump(out, f)
    except OSError:
        pass


def run_chain(probe=_probe_device, e2e=None, micro=None,
              cache_path=CACHE_PATH,
              probe_timeouts=(600, 300, 300), backoffs=(60, 120),
              sleep=time.sleep, log=None):
    """Bench fallback chain (BENCH_r02 postmortem): a relay outage must
    degrade to (a) probe retries with backoff, then (b) the splat
    microbench, then (c) the LAST GOOD cached e2e number marked
    ``"stale": true`` — never a bare 0.0 while a prior measurement exists.
    Dependency-injected so tests simulate outages without a device."""
    e2e = e2e or e2e_serving
    micro = micro or splat_microbench
    log = log or (lambda msg: print(msg, file=sys.stderr))

    probe_err = None
    for i, t in enumerate(probe_timeouts):
        if i:
            sleep(backoffs[min(i - 1, len(backoffs) - 1)])
        try:
            probe(timeout_s=t)
            probe_err = None
            break
        except BaseException as e:  # noqa: BLE001 — TimeoutExpired et al.
            probe_err = e
            log(f"[bench] device probe attempt {i + 1}/{len(probe_timeouts)}"
                f" failed ({type(e).__name__}: {e})")

    err = None
    if probe_err is None:
        try:
            out = e2e()
            _save_cache(out, cache_path)
            return out
        except Exception as e:  # noqa: BLE001 — emit SOMETHING for the driver
            err = f"{type(e).__name__}: {e}"
            log(f"[bench] e2e path failed ({err}); "
                "falling back to splat microbench")
        try:
            return micro()
        except Exception as e2:  # noqa: BLE001 — device died mid-run
            err = f"{type(e2).__name__}: {e2}"
            log(f"[bench] splat microbench also failed ({err})")
    else:
        # device unusable: e2e/micro would hang — go straight to the cache
        err = f"{type(probe_err).__name__}: device unavailable"

    cached = _load_cache(cache_path)
    if cached is not None:
        log(f"[bench] emitting last-good cached result (stale) after: {err}")
        return {**cached, "stale": True, "error": err}
    return {"metric": "e2e_audio_to_512px_avatar", "value": 0.0,
            "unit": "fps", "vs_baseline": 0.0, "error": err}


def main():
    print(json.dumps(run_chain()))


if __name__ == "__main__":
    main()
