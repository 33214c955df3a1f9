"""End-to-end serving benchmark: audio features -> rendered 512x512 frames.

Measures the EXACT demo-serving program (main2.run_demo's jitted `rollout`):
AudioTriplaneNet AR rollout (8L x T_out steps) -> shared SMPLXDecoder ->
Renderer (triplane upsample 32->512, SMPLX FK/LBS + subdivision to 30k
gaussians, triplane sampling x2, PTv3 refiner, gaussian heads, Pallas splat)
at full reference dims, bf16 compute.

Reference semantics (reference src/main2.py:159-319): the demo interleaves
TWO frame streams (even/odd video frames), each chunk a T_out=6-frame
rollout; the output video consumes 12 frames per stream pair. Our demo
batches both streams as B=2 through ONE compiled rollout, so e2e fps =
(B * T_out) output video frames / rollout wall time.

Usage:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python tools/serve_bench.py \
      [--batch 2] [--frames-per-chunk 6] [--ablate COMPONENT] [--reps 5]

--ablate skips one component to attribute time (same graph otherwise):
  none | audio | upsampler | refiner | render | heads
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


def build(batch: int, frames_per_chunk: int, ablate: str = "none",
          image_size=(512, 512), sparse: bool = False,
          sparse_cap: int = 384, sparse_tile: int = 16,
          splat_segmented: bool = True, upconv: str = "poly",
          sample_slab: bool = False, sparse_pen: bool = False,
          sparse_pen_cap: int = 128, splat_window: int = 4,
          fuse_chunks: int = 1, want_ctx: bool = False, base_cfg=None,
          smplx_model=None, **cfg_overrides):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.audio_avatar import AudioDrivenAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.ptv3 import build_point_refiner
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.models.triplane_encoder import reshape_params
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel.mesh import unbox

    serving_fields = dict(
        image_size=tuple(image_size),
        compute_dtype="bfloat16",
        frames_per_chunk=frames_per_chunk,
        upsample_triplane=(ablate != "upsampler"),
        no_point_refiner=(ablate == "refiner"),
        upsampler_sparse=sparse,
        upsampler_sparse_max_tiles=sparse_cap,
        upsampler_sparse_tile_px=sparse_tile,
        upsampler_sparse_penultimate=sparse_pen,
        upsampler_sparse_pen_max_tiles=sparse_pen_cap,
        splat_segmented=splat_segmented,
        splat_max_window=splat_window,
        upsampler_upconv=upconv,
        sample_slab=sample_slab,
        # serving: no backward -> no remat; unroll the 2-chunk frame scan so
        # XLA overlaps chunk 0's HBM-bound tail with chunk 1's compute
        frames_scan_remat=False,
        frames_scan_unroll=8,
        audio_transformer_remat=False,
    )
    # extra AvatarConfig fields (e.g. sample_quad, upsampler_conv) — lets
    # bench.py pin the production profile without new kwargs; overrides WIN
    # over the serving defaults above (tests pass e.g. compute_dtype=None)
    serving_fields.update(cfg_overrides)
    cfg = dataclasses.replace(
        base_cfg if base_cfg is not None else AvatarConfig(),
        **serving_fields)
    if smplx_model is None:
        smplx_model = smplx_ops.synthetic_model(seed=0)
    statics = build_renderer_statics(smplx_model,
                                     subdivide_steps=cfg.subdivide_steps,
                                     densify=cfg.densify_smplx_verts)
    nverts_enc = int(smplx_model.v_template.shape[0]) + \
        int(np.asarray(smplx_model.faces).shape[0])
    refiner = None if cfg.no_point_refiner else build_point_refiner(cfg)
    model = AudioDrivenAvatar(cfg=cfg, num_verts_encoder=nverts_enc,
                              point_refiner=refiner)

    B = batch
    T_in, T_out = cfg.triplane_input_frames, cfg.triplane_output_frames
    C = cfg.triplane_feature_dim
    S_tri = 3 * cfg.triplane_resolution ** 2
    L = cfg.smpl_token_len
    H, W = cfg.image_size

    rng = np.random.RandomState(0)
    triplanes = jnp.asarray(rng.randn(B, T_in, C, S_tri).astype(np.float32) * 0.1)
    smpl_tokens = jnp.asarray(rng.randn(B, T_in, C, L).astype(np.float32) * 0.1)
    audio = jnp.asarray(rng.randn(B, fuse_chunks * T_out,
                                  cfg.audio_feature_dim)
                        .astype(np.float32) * 0.1)
    tgt = make_batch(B, T_out, (H, W), seed=3,
                     num_expr=cfg.num_expression_coeffs)
    cam = {k: jnp.asarray(v) for k, v in tgt.cam_parms.items()}

    def chunk_step(mdl, tri, smpl, aud, cam_chunk):
        """ONE demo chunk (T_out frames) — the unfenced core."""
        if ablate == "audio":
            out_tri = jnp.repeat(tri[:, -1:], T_out, axis=1)
            out_smpl = jnp.repeat(smpl[:, -1:], T_out, axis=1)
        else:
            out_tri, out_smpl = mdl.audio_triplane(aud, tri, smpl)
        Bc, T = out_smpl.shape[:2]
        flat = out_smpl.reshape((Bc * T,) + out_smpl.shape[2:])
        pred = reshape_params(
            mdl.triplane_gaussian.encoder.smpl_decoder(flat), (Bc, T))
        rendered, gaussians = mdl.triplane_gaussian.renderer(
            statics, out_tri, cam_chunk, pred, render=(ablate != "render"))
        return rendered, out_tri, out_smpl, gaussians

    # init only the needed submodules via a full init at tiny image cost:
    # (init runs the rollout graph; use the real dims — one-time cost)
    def rollout_fn(mdl, tri, smpl, aud, cam_chunk):
        """`fuse_chunks` consecutive demo chunks in ONE program, threading
        the sliding last-T_in token window between them exactly as the demo
        host loop does (main2 demo / reference src/main2.py:202-203) —
        semantics-identical to dispatching the chunks separately, but the
        fixed per-program cost (dispatch gaps, in/out barriers — ~24 ms
        idle/rollout on the xprof_affine trace) is paid once per `fuse`
        chunks. Serving keeps frames_per_chunk=6 reference semantics."""
        T_in_w = tri.shape[1]
        rendereds = []
        fence = jnp.zeros((), jnp.float32)
        for c in range(fuse_chunks):
            aud_c = aud[:, c * T_out:(c + 1) * T_out]
            rendered, out_tri, out_smpl, gaussians = chunk_step(
                mdl, tri, smpl, aud_c, cam_chunk)
            tri = out_tri[:, -T_in_w:]
            smpl = out_smpl[:, -T_in_w:]
            rendereds.append(rendered)
            # fence on the gaussians too: with render=False the images are
            # None and fencing only the tokens would let XLA DCE the
            # renderer. Returned as a SEPARATE scalar output (not folded
            # into out_tri) so the threaded token window stays clean.
            fence = fence + (gaussians["xyz"].mean()
                             + gaussians["color"].mean()).astype(jnp.float32)
        rendered = (jnp.concatenate(rendereds, axis=1)
                    if rendereds[0] is not None else None)
        return rendered, out_tri, out_smpl, fence

    def init_fn(mdl, tri, smpl, aud, cam_chunk):
        # same module graph, render skipped: params are identical and init
        # never allocates the full-frame splat buffers
        out_tri, out_smpl = mdl.audio_triplane(aud, tri, smpl)
        Bc, T = out_smpl.shape[:2]
        flat = out_smpl.reshape((Bc * T,) + out_smpl.shape[2:])
        pred = reshape_params(
            mdl.triplane_gaussian.encoder.smpl_decoder(flat), (Bc, T))
        return mdl.triplane_gaussian.renderer(statics, out_tri, cam_chunk,
                                              pred, render=False)

    print("[serve_bench] init...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), triplanes, smpl_tokens,
                           audio, cam, method=init_fn)
    params = unbox(variables)["params"]
    print("[serve_bench] init done", flush=True)

    def make_rollout(cfg_v):
        """Rebuild the model for a cfg VARIANT (same param tree) and jit."""
        refiner_v = None if cfg_v.no_point_refiner else build_point_refiner(cfg_v)
        model_v = AudioDrivenAvatar(cfg=cfg_v, num_verts_encoder=nverts_enc,
                                    point_refiner=refiner_v)

        @jax.jit
        def rollout_v(params, tri, smpl, aud, cam_chunk):
            return model_v.apply({"params": params}, tri, smpl, aud,
                                 cam_chunk, method=rollout_fn)

        return rollout_v

    rollout = make_rollout(cfg)
    # frames-per-dispatch accounting: fused chunks emit fuse*T_out frames
    out = (rollout, params, (triplanes, smpl_tokens, audio, cam),
           (B, T_out * fuse_chunks))
    if want_ctx:
        return out + ((make_rollout, cfg),)
    return out


def run_sweep(variants, batch=2, frames_per_chunk=6, reps=5,
              image_size=(512, 512), sparse=False, sparse_cap=384,
              sparse_tile=16, splat_segmented=True, upconv="poly",
              sample_slab=False, sparse_pen=False, sparse_pen_cap=128,
              splat_window=4, trace_out=None, fuse_chunks=1,
              **cfg_overrides):
    """Bench several cfg variants in ONE process, initializing params once.

    `variants`: list of (name, {AvatarConfig field overrides}). Every
    variant must keep the SAME parameter tree as the base config (knobs
    like sparse_penultimate / splat_max_window / caps / frames_per_chunk
    qualify; rgb/sh_degree/feature dims do not) — params are reused, only
    the model object and the jitted rollout are rebuilt. Saves the ~10 min
    single-core init trace per config that separate processes pay."""
    import dataclasses
    import jax

    rollout, params, args_, (B, T_out), ctx = build(
        batch, frames_per_chunk, "none", image_size, sparse, sparse_cap,
        sparse_tile, splat_segmented, upconv, sample_slab, sparse_pen,
        sparse_pen_cap, splat_window, fuse_chunks, want_ctx=True,
        **cfg_overrides)
    tri, smpl, aud, cam = args_
    make_rollout, base_cfg = ctx

    def fence(out):
        r = out[0]
        # out[3] is the gaussians fence scalar (keeps render=False honest)
        return (float(r.mean()) if r is not None else 0.0) + float(out[3])

    results = []
    for name, over in variants:
        cfg_v = dataclasses.replace(base_cfg, **over)
        roll_v = make_rollout(cfg_v)
        print(f"[serve_bench] compiling variant {name}...", flush=True)
        try:
            t0 = time.time()
            fence(roll_v(params, tri, smpl, aud, cam))
            compile_s = time.time() - t0
            # pipelined steady-state timing (see run(): programs execute
            # in order on the device stream, one fence proves all done)
            preps = max(reps, 6)
            t0 = time.time()
            last = None
            for _ in range(preps):
                last = roll_v(params, tri, smpl, aud, cam)
            fence(last)
        except Exception as e:  # noqa: BLE001 — a bad variant (OOM, kernel
            # refusal) must not kill the remaining variants' measurements
            res = {"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(res), flush=True)
            results.append(res)
            continue
        dt = (time.time() - t0) / preps
        res = {"variant": name, "fps": round((B * T_out) / dt, 2),
               "rollout_ms": round(dt * 1000.0, 2),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(res), flush=True)
        results.append(res)
        if trace_out and name == variants[0][0]:
            # xprof-capture the FIRST variant (the production config) in
            # the same process — saves a whole init+compile for profiling.
            # Analyze with: python tools/xprof_trace.py --analyze-only
            #   --out <trace_out>
            os.makedirs(trace_out, exist_ok=True)
            with jax.profiler.trace(trace_out):
                for _ in range(3):
                    fence(roll_v(params, tri, smpl, aud, cam))
            print(f"[serve_bench] trace written to {trace_out}", flush=True)
    return results


def run(batch=2, frames_per_chunk=6, ablate="none", reps=5,
        image_size=(512, 512), sparse=False, sparse_cap=384, sparse_tile=16,
        splat_segmented=True, upconv="poly", sample_slab=False,
        sparse_pen=False, sparse_pen_cap=128, splat_window=4,
        fuse_chunks=1, **cfg_overrides):
    rollout, params, args_, (B, T_out) = build(batch, frames_per_chunk,
                                               ablate, image_size, sparse,
                                               sparse_cap, sparse_tile,
                                               splat_segmented, upconv,
                                               sample_slab, sparse_pen,
                                               sparse_pen_cap, splat_window,
                                               fuse_chunks,
                                               **cfg_overrides)
    tri, smpl, aud, cam = args_

    def fence(out):
        # float() forces a device->host sync (block_until_ready is not
        # reliable through the axon relay — round-1 finding); out[3] is the
        # gaussians fence scalar (keeps render=False honest)
        r = out[0]
        return (float(r.mean()) if r is not None else 0.0) + float(out[3])

    print("[serve_bench] compiling rollout...", flush=True)
    t0 = time.time()
    fence(rollout(params, tri, smpl, aud, cam))
    compile_s = time.time() - t0
    print(f"[serve_bench] compile {compile_s:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        fence(rollout(params, tri, smpl, aud, cam))
    dt = (time.time() - t0) / reps

    # Steady-state (pipelined) throughput: a serving loop dispatches the
    # next chunk while the device runs the current one, so per-dispatch
    # relay latency (~30 ms/program on this box, x2 with the .mean() fence)
    # overlaps device execution. TPU PjRt executes programs in order on the
    # one device stream, so fencing ONLY the last rollout's output proves
    # all queued ones finished; per-rep fencing (above) instead serializes
    # host round-trips into the measurement (~150 ms/rollout here: 762 ms
    # device trace vs 912 ms per-rep-fenced, 2026-08-17 xprof).
    preps = max(reps, 6)
    t0 = time.time()
    last = None
    for _ in range(preps):
        last = rollout(params, tri, smpl, aud, cam)
    fence(last)
    pdt = (time.time() - t0) / preps
    fps = (B * T_out) / pdt
    return {"fps": fps, "rollout_ms": pdt * 1000.0,
            "fenced_latency_ms": dt * 1000.0, "compile_s": compile_s,
            "batch": B, "frames": B * T_out, "ablate": ablate,
            "fuse_chunks": fuse_chunks}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames-per-chunk", type=int, default=6)
    ap.add_argument("--ablate", default="none",
                    choices=["none", "audio", "upsampler", "refiner", "render"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--sparse", action="store_true",
                    help="tile-sparse final upsample level")
    ap.add_argument("--sparse-cap", type=int, default=384)
    ap.add_argument("--sparse-tile", type=int, default=16)
    ap.add_argument("--no-splat-segmented", action="store_true")
    ap.add_argument("--upconv", default="poly", choices=["poly", "dilated"])
    ap.add_argument("--slab", action="store_true",
                    help="sparse sampling via (2,2C) slab gathers")
    ap.add_argument("--sparse-pen", action="store_true",
                    help="sparse penultimate upsample level too")
    ap.add_argument("--sparse-pen-cap", type=int, default=128)
    ap.add_argument("--splat-window", type=int, default=4)
    ap.add_argument("--fuse-chunks", type=int, default=1,
                    help="consecutive demo chunks fused into one program "
                         "(sliding window threaded in-graph; exact)")
    ap.add_argument("--set", dest="set_", default=None,
                    help="comma-separated AvatarConfig overrides for a "
                         "single (non-sweep) run: 'field=val,field=val' — "
                         "values parsed as JSON")
    ap.add_argument("--trace-out", default=None,
                    help="with --sweep: xprof-trace the first variant into "
                         "this directory after timing it")
    ap.add_argument("--sweep", default=None,
                    help="semicolon-separated variants benched in ONE "
                         "process (shared init): "
                         "'name:field=val,field=val;name2:...' — fields are "
                         "AvatarConfig overrides on top of the base flags; "
                         "values parsed as JSON (true/false/ints/strings)")
    a = ap.parse_args()
    if a.sweep:
        variants = []
        for spec in a.sweep.split(";"):
            name, _, kvs = spec.partition(":")
            over = {}
            for kv in filter(None, kvs.split(",")):
                k, _, v = kv.partition("=")
                try:
                    over[k] = json.loads(v)
                except json.JSONDecodeError:
                    over[k] = v
            variants.append((name, over))
        run_sweep(variants, a.batch, a.frames_per_chunk, a.reps,
                  tuple(a.image_size), sparse=a.sparse,
                  sparse_cap=a.sparse_cap, sparse_tile=a.sparse_tile,
                  splat_segmented=not a.no_splat_segmented, upconv=a.upconv,
                  sample_slab=a.slab, sparse_pen=a.sparse_pen,
                  sparse_pen_cap=a.sparse_pen_cap,
                  splat_window=a.splat_window, trace_out=a.trace_out)
        return
    overrides = {}
    for kv in filter(None, (a.set_ or "").split(",")):
        k, _, v = kv.partition("=")
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v
    res = run(a.batch, a.frames_per_chunk, a.ablate, a.reps,
              tuple(a.image_size), sparse=a.sparse, sparse_cap=a.sparse_cap,
              sparse_tile=a.sparse_tile,
              splat_segmented=not a.no_splat_segmented, upconv=a.upconv,
              sample_slab=a.slab, sparse_pen=a.sparse_pen,
              sparse_pen_cap=a.sparse_pen_cap, splat_window=a.splat_window,
              fuse_chunks=a.fuse_chunks, **overrides)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
