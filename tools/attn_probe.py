"""Probe: attention implementations at the audio-rollout shape.

The stage-2 AR rollout runs 8 layers x 6 steps of self-attention over
S=6304 tokens (3072 tri-motion + 80 smpl-motion + 3072 last-tri + 80
last-smpl), H=8 heads, D=64. The S^2 logits are ~636MB/layer in bf16 —
the HBM bottleneck of the audio net. This probe times, inside ONE jit
(fori_loop, input perturbed per iter, float() fenced — bench methodology
from the verify skill):

  * XLA materialized attention (the current default path)
  * Pallas flash attention across a block-size grid

Usage: python tools/attn_probe.py [--batch 1] [--seq 6304] [--iters 20]
"""

import argparse
import functools
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


def time_fn(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            out = fn(q + 1e-6 * i, k, v)
            return acc + out.mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(q, k, v))  # compile + sync
    t0 = time.time()
    float(loop(q, k, v))
    return (time.time() - t0) / iters * 1000.0


def xla_attn(q, k, v):
    # (B, S, H, D) bf16, logits in bf16 (compute-dtype semantics)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def flash_attn(block_q, block_k, q, k, v):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    B, S, H, D = q.shape
    BLK = max(block_q, block_k)
    Sp = ((S + BLK - 1) // BLK) * BLK
    pad = Sp - S

    def p(t):
        return jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))

    qh = p(q).transpose(0, 2, 1, 3)
    kh = p(k).transpose(0, 2, 1, 3)
    vh = p(v).transpose(0, 2, 1, 3)
    seg = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, Sp))
    bs = fa.BlockSizes(block_q=block_q, block_k_major=block_k,
                       block_k=block_k, block_b=1)
    out = fa.flash_attention(qh, kh, vh,
                             segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=D ** -0.5, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :S]


def flash_seg(block_q, block_k, Sp, q, k, v):
    """Production pad plan: pad to the 128-multiple Sp (not a block
    multiple) with segment-id masking; blocks must divide Sp."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    B, S, H, D = q.shape
    pad = Sp - S

    def p(t):
        return jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))

    qh = p(q).transpose(0, 2, 1, 3)
    kh = p(k).transpose(0, 2, 1, 3)
    vh = p(v).transpose(0, 2, 1, 3)
    seg = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, Sp))
    bs = fa.BlockSizes(block_q=block_q, block_k_major=block_k,
                       block_k=block_k, block_b=1)
    out = fa.flash_attention(qh, kh, vh,
                             segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=D ** -0.5, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :S]


def flash_seg2(block_q, block_k, Sp, q, k, v):
    """flash_seg with the base-2 softmax fork (ops/flash2.py): stock
    kernel clone with exp->exp2, log2(e) folded into the query scale."""
    from audio_motion_avatar_tpu.ops.flash2 import (fold_scale_base2,
                                                    get_exp2_module)
    fa = get_exp2_module()
    B, S, H, D = q.shape
    pad = Sp - S

    def p(t):
        return jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))

    qh = fold_scale_base2(p(q).transpose(0, 2, 1, 3), D ** -0.5)
    kh = p(k).transpose(0, 2, 1, 3)
    vh = p(v).transpose(0, 2, 1, 3)
    seg = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, Sp))
    bs = fa.BlockSizes(block_q=block_q, block_k_major=block_k,
                       block_k=block_k, block_b=1)
    out = fa.flash_attention(qh, kh, vh,
                             segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=1.0, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :S]


def splash_attn(block_q, block_kv, q, k, v):
    """splash-attention kernel (newer v5e-tuned Pallas MHA)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm)
    B, S, H, D = q.shape
    BLK = max(block_q, block_kv)
    Sp = ((S + BLK - 1) // BLK) * BLK
    pad = Sp - S

    def p(t):
        return jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))

    qh = p(q).transpose(0, 2, 1, 3)  # (B, H, Sp, D)
    kh = p(k).transpose(0, 2, 1, 3)
    vh = p(v).transpose(0, 2, 1, 3)
    seg = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, Sp))
    mask = sm.MultiHeadMask(
        [sm.FullMask((Sp, Sp)) for _ in range(H)])
    bs = sk.BlockSizes(block_q=block_q, block_kv=block_kv,
                       block_kv_compute=block_kv)
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                block_sizes=bs)
    scale = D ** -0.5

    def one(qb, kb, vb, sb):
        return kernel(qb * scale, kb, vb,
                      segment_ids=sk.SegmentIds(q=sb, kv=sb))
    out = jax.vmap(one)(qh, kh, vh, seg)
    return out.transpose(0, 2, 1, 3)[:, :S]


def hpack(block_q, block_k, hpb, q, k, v):
    """Head-packed forward kernel (ops/hpack_attention.py): hpb heads per
    grid step, heads interleaved inside the k-chunk loop so one head's VPU
    softmax overlaps the other's half-width MXU dots."""
    from audio_motion_avatar_tpu.ops.hpack_attention import hpack_attention
    B, S, H, D = q.shape
    out = hpack_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3), scale=D ** -0.5,
                          block_q=block_q, block_k=block_k,
                          heads_per_block=hpb)
    return out.transpose(0, 2, 1, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=6304)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--exp2-only", action="store_true",
                    help="only the production pad plan, stock vs exp2 fork")
    ap.add_argument("--hpack-only", action="store_true",
                    help="stock flash baseline vs head-packed kernel sweep")
    a = ap.parse_args()

    if a.hpack_only:
        rng = np.random.RandomState(0)
        shape = (a.batch, a.seq, a.heads, a.dim)
        q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        Sp = ((a.seq + 127) // 128) * 128
        bq0 = [b for b in range(1280, 127, -128) if Sp % b == 0][0]
        ref = np.asarray(flash_seg(bq0, bq0, Sp, q, k, v), np.float32)
        got = np.asarray(hpack(512, 1280, 2, q, k, v), np.float32)
        print(json.dumps({"impl": "hpack_maxdiff",
                          "maxdiff": float(np.abs(ref - got).max())}),
              flush=True)
        ms = time_fn(functools.partial(flash_seg, bq0, bq0, Sp), q, k, v,
                     a.iters)
        print(json.dumps({"impl": f"flashseg_q{bq0}_k{bq0}",
                          "ms": round(ms, 3)}), flush=True)
        for hpb in (1, 2, 4):
            for bq in (256, 512, 640):
                for bk in (640, 1280):
                    try:
                        ms = time_fn(functools.partial(hpack, bq, bk, hpb),
                                     q, k, v, a.iters)
                    except Exception as e:  # Mosaic may reject a config
                        print(json.dumps({"impl": f"hpack_h{hpb}_q{bq}_k{bk}",
                                          "error": str(e)[:120]}), flush=True)
                        continue
                    print(json.dumps({"impl": f"hpack_h{hpb}_q{bq}_k{bk}",
                                      "ms": round(ms, 3)}), flush=True)
        return

    rng = np.random.RandomState(0)
    shape = (a.batch, a.seq, a.heads, a.dim)
    q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    if a.exp2_only:
        Sp = ((a.seq + 127) // 128) * 128
        blocks = [b for b in range(1280, 127, -128) if Sp % b == 0][:2]
        # numeric sanity at the real shape before timing
        b0 = blocks[0]
        ref = np.asarray(flash_seg(b0, b0, Sp, q, k, v), np.float32)
        got = np.asarray(flash_seg2(b0, b0, Sp, q, k, v), np.float32)
        print(json.dumps({"impl": f"exp2_maxdiff_q{b0}",
                          "maxdiff": float(np.abs(ref - got).max())}),
              flush=True)
        for bq in blocks:
            for name, fn in ((f"flashseg_q{bq}_k{bq}", flash_seg),
                             (f"flash2seg_q{bq}_k{bq}", flash_seg2)):
                ms = time_fn(functools.partial(fn, bq, bq, Sp), q, k, v,
                             a.iters)
                print(json.dumps({"impl": name, "ms": round(ms, 3)}),
                      flush=True)
        return

    results = {}
    results["xla_bf16"] = time_fn(xla_attn, q, k, v, a.iters)
    print(json.dumps({"impl": "xla_bf16", "ms": round(results['xla_bf16'], 3)}),
          flush=True)

    # production pad plan (models/transformer.py Attention._flash): pad S to
    # the next 128 multiple (6304 -> 6400) with segment-id masking, then
    # sweep every 128-multiple block pair that divides the padded length —
    # much less padded work than the power-of-two grid below.
    Sp = ((a.seq + 127) // 128) * 128
    blocks = [b for b in range(128, min(Sp, 3200) + 1, 128) if Sp % b == 0]
    for bq in blocks:
        for bk in blocks:
            name = f"flashseg_q{bq}_k{bk}"
            try:
                ms = time_fn(functools.partial(flash_seg, bq, bk, Sp),
                             q, k, v, a.iters)
                results[name] = ms
                print(json.dumps({"impl": name, "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": name, "error": str(e)[:120]}),
                      flush=True)

    for bq in (512, 1024, 2048):
        for bk in (512, 1024, 2048):
            name = f"flash_q{bq}_k{bk}"
            try:
                ms = time_fn(functools.partial(flash_attn, bq, bk),
                             q, k, v, a.iters)
                results[name] = ms
                print(json.dumps({"impl": name, "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": name, "error": str(e)[:120]}),
                      flush=True)

    for bq in (512, 1024, 2048):
        for bk in (512, 1024, 2048):
            name = f"splash_q{bq}_k{bk}"
            try:
                ms = time_fn(functools.partial(splash_attn, bq, bk),
                             q, k, v, a.iters)
                results[name] = ms
                print(json.dumps({"impl": name, "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": name, "error": str(e)[:120]}),
                      flush=True)

    # custom forward-only serving kernel (ops/serve_attention.py): K/V
    # resident in VMEM, single-pass exact softmax, exp vs exp2 knob
    from audio_motion_avatar_tpu.ops.serve_attention import serve_attention

    def serve(bq, e2, lb, q, k, v):
        out = serve_attention(q.transpose(0, 2, 1, 3),
                              k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3),
                              scale=a.dim ** -0.5, block_q=bq,
                              use_exp2=e2, logits_bf16=lb)
        return out.transpose(0, 2, 1, 3)

    # bq=512 dropped: the (512, 6400) f32 logits block + elementwise chain
    # oversubscribes the 16 MB VMEM and can WEDGE the remote compiler
    # rather than erroring (observed with an equivalent vpu_probe block)
    for bq in (128, 256):
        for e2 in (False, True):
            for lb in (False, True):
                name = (f"serve_q{bq}_{'exp2' if e2 else 'exp'}"
                        f"{'_bf16' if lb else ''}")
                try:
                    ms = time_fn(functools.partial(serve, bq, e2, lb),
                                 q, k, v, a.iters)
                    results[name] = ms
                    print(json.dumps({"impl": name, "ms": round(ms, 3)}),
                          flush=True)
                except Exception as e:  # noqa: BLE001 — VMEM overflow at
                    # big block_q is an expected sweep outcome
                    print(json.dumps({"impl": name, "error": str(e)[:120]}),
                          flush=True)

    best = min(results, key=results.get)
    print(json.dumps({"best": best, "ms": round(results[best], 3),
                      "batch": a.batch, "seq": a.seq}))


if __name__ == "__main__":
    main()
