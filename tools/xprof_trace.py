"""Trace the exact serving rollout on TPU and print per-HLO-op time.

Builds the same jitted program as tools/serve_bench.py, captures a
jax.profiler trace of a few steady-state reps, then converts the xplane
with the tensorboard profile plugin (hlo_stats) and prints the top ops by
self time — the attribution that drives the e2e optimization work.

Usage:
  python tools/xprof_trace.py [--batch 2] [--sparse] [--sparse-cap 256]
      [--top 50] [--out /tmp/ama_trace]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # env var alone is too late (sitecustomize imports jax first)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
# tensorboard_plugin_profile ships pre-protoc-3.19 _pb2 modules; the C++
# protobuf runtime in this image refuses them — force the pure-python one.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(out_dir, batch, frames, sparse, cap, tile, upconv="poly", reps=3,
            **cfg_overrides):
    import jax
    from serve_bench import build
    rollout, params, args_, _ = build(batch, frames, "none", (512, 512),
                                      sparse, cap, tile, upconv=upconv,
                                      **cfg_overrides)
    tri, smpl, aud, cam = args_

    def fence(out):
        return float(out[0].mean())

    print("[xprof] compiling...", flush=True)
    fence(rollout(params, tri, smpl, aud, cam))
    print("[xprof] tracing...", flush=True)
    jax.profiler.start_trace(out_dir)
    for _ in range(reps):
        fence(rollout(params, tri, smpl, aud, cam))
    jax.profiler.stop_trace()
    print("[xprof] trace done", flush=True)


def analyze(out_dir, top):
    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane found under", out_dir)
        return
    path = paths[-1]
    print("[xprof] analyzing", path, flush=True)
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [path], tool, {"tqx": "out:csv;"})
            fn = os.path.join(out_dir, tool + (
                ".csv" if isinstance(data, (str, bytes)) and tool != "op_profile"
                else ".out"))
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            print(f"[xprof] wrote {fn}", flush=True)
        except Exception as e:
            print(f"[xprof] {tool} failed: {type(e).__name__}: {e}",
                  flush=True)

    csv_path = os.path.join(out_dir, "hlo_stats.csv")
    if os.path.exists(csv_path):
        summarize_hlo_csv(csv_path, top)
    fw_path = os.path.join(out_dir, "framework_op_stats.csv")
    if os.path.exists(fw_path):
        summarize_components(fw_path)


def summarize_components(fw_path, reps=3):
    """Bucket device self-time by pipeline component from the jax scope
    names in framework_op_stats (gviz JSON)."""
    try:
        raw = json.loads(open(fw_path).read())
    except Exception:
        return
    d = raw[0] if isinstance(raw, list) else raw
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}

    def get(r, cid):
        v = r["c"][idx[cid]]
        return v["v"] if v else None

    buckets = {}
    for r in d["rows"]:
        if get(r, "host_or_device") != "Device":
            continue
        t = get(r, "total_self_time") or 0
        name = str(get(r, "operation"))
        if "flash_attention" in name or "audio_triplane" in name:
            b = "audio_transformer"
        elif "point_refiner" in name:
            b = "ptv3_refiner"
        elif "upsampler" in name:
            b = "upsampler"
        elif "pallas_call" in name or "argsort" in name or "/sort" in name:
            b = "splat_kernel+sorts"
        elif "_render_frame" in name and ("gather" in name or "_take" in name):
            b = "sampling_gathers"
        elif "IDLE" in name:
            b = "idle"
        elif "_render_frame" in name or "renderer" in name:
            b = "renderer_other"
        else:
            b = "other"
        buckets[b] = buckets.get(b, 0.0) + t
    tot = sum(buckets.values())
    print(f"\n== component buckets (/{reps} reps -> per-rollout ms; "
          f"total {tot/(reps*1e3):.0f}) ==")
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{b:24s} {t/(reps*1e3):8.1f}")


def summarize_hlo_csv(csv_path, top):
    """Despite the .csv name, the plugin emits gviz JSON — parse it and
    print per-HLO self time, measured bandwidth and boundedness."""
    try:
        d = json.loads(open(csv_path).read())
    except Exception as e:
        print(f"[xprof] hlo_stats parse failed: {e}")
        return
    d = d[0] if isinstance(d, list) else d
    idx = {c["id"]: i for i, c in enumerate(d["cols"])}

    def get(r, cid):
        v = r["c"][idx[cid]]
        return v["v"] if v else None

    items = []
    for r in d["rows"]:
        t = get(r, "total_self_time") or 0
        if not t:
            continue
        bound = get(r, "bound_by") or ""
        bw = get(r, "measured_memory_bw") or 0
        expr = str(get(r, "hlo_op_expression"))[:150]
        items.append((float(t), f"{bound} {bw:.0f}GB/s", expr))
    items.sort(reverse=True)
    total = sum(v for v, _, _ in items)
    print(f"\n== top {top} HLO ops by self time (total {total/1e3:.1f} ms "
          f"across traced reps) ==")
    for v, cat, name in items[:top]:
        print(f"{v/1e3:9.3f} ms {100*v/total:5.1f}%  [{cat}] {name}")
    agg = {}
    for v, cat, _ in items:
        b = cat.split()[0] if cat.split() else "?"
        agg[b] = agg.get(b, 0.0) + v
    print("\n== by boundedness ==")
    for cat, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e3:9.3f} ms {100*v/total:5.1f}%  {cat}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames-per-chunk", type=int, default=6)
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--sparse-cap", type=int, default=256)
    ap.add_argument("--sparse-tile", type=int, default=16)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--upconv", default="poly", choices=["poly", "dilated"])
    ap.add_argument("--quad", action="store_true",
                    help="sample_quad=True")
    ap.add_argument("--wino", action="store_true",
                    help="upsampler_conv='winograd'")
    ap.add_argument("--out", default="/tmp/ama_trace")
    ap.add_argument("--analyze-only", action="store_true")
    a = ap.parse_args()
    if not a.analyze_only:
        os.makedirs(a.out, exist_ok=True)
        over = {}
        if a.quad:
            over["sample_quad"] = True
        if a.wino:
            over["upsampler_conv"] = "winograd"
        capture(a.out, a.batch, a.frames_per_chunk, a.sparse, a.sparse_cap,
                a.sparse_tile, upconv=a.upconv, **over)
    analyze(a.out, a.top)


if __name__ == "__main__":
    main()
