"""Head-packed forward-only Pallas attention for D=64 serving shapes.

The stage-2 AR transformer's attention runs at (B=2, H=8, S=6304, D=64)
48 times per rollout (reference xformers path, src/models/transformers.py:
31-90). Round-4 measurement put the stock flash kernel at 39% of the naive
MXU bound and diagnosed the gap as D=64 half-lane block pipeline: every MXU
dot in the kernel is half-width (QK^T contracts over 64 of 128 lanes, PV
emits 64 of 128 output lanes), and each (q-block, k-block) grid step
alternates one MXU chain with one VPU softmax chain, leaving whichever unit
is idle.

This kernel packs `heads_per_block` heads into ONE grid step (block shape
(1, hpb, bq, D) over the untouched (B, H, S, D) layout — no host-side
repacking) and *interleaves the heads inside the k-chunk loop*: head 0's
exp/renormalize (VPU) can overlap head 1's QK/PV dots (MXU), amortizing the
half-width pipeline bubbles that a one-head-per-step kernel cannot fill.
K/V for the packed heads stay resident in VMEM across q blocks (~1.6 MB per
head at S=6400 bf16), streamed once per (batch, head-pair).

Forward-only: serving never differentiates the rollout; training keeps the
differentiable stock flash kernel (models/transformer.py Attention._flash).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
            block_k: int, n_chunks: int, hpb: int):
    # q_ref (1, hpb, BQ, D); k_ref/v_ref (1, hpb, Sp, D); bias (1, Sp)
    BQ = q_ref.shape[2]
    D = q_ref.shape[3]
    qs = [q_ref[0, h] for h in range(hpb)]                  # (BQ, D) bf16
    m = [jnp.full((BQ, 1), NEG_INF, jnp.float32) for _ in range(hpb)]
    l = [jnp.zeros((BQ, 1), jnp.float32) for _ in range(hpb)]
    acc = [jnp.zeros((BQ, D), jnp.float32) for _ in range(hpb)]

    for c in range(n_chunks):          # unrolled: chunk count is static
        sl = pl.ds(c * block_k, block_k)
        b = bias_ref[0, sl][None, :]                        # (1, BK)
        for h in range(hpb):           # interleave heads inside the chunk
            k = k_ref[0, h, sl]                             # (BK, D)
            v = v_ref[0, h, sl]
            s = jax.lax.dot_general(
                qs[h], k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (BQ, BK)
            s = s * scale + b
            m_new = jnp.maximum(m[h], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m[h] - m_new)
            l[h] = l[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc[h] = acc[h] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m[h] = m_new

    for h in range(hpb):
        o_ref[0, h] = (acc[h] / l[h]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "heads_per_block", "interpret"))
def hpack_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_q: int = 512, block_k: int = 1280,
                    heads_per_block: int = 2,
                    interpret: bool = False) -> jnp.ndarray:
    """(B, H, S, D) q/k/v -> (B, H, S, D), exact softmax(qk^T*scale)v.

    Pads S to a lane multiple; padded keys are masked by an additive -1e9
    bias row; padded query rows compute finite garbage and are sliced off.
    H must be divisible by heads_per_block.
    """
    B, H, S, D = q.shape
    Skv = k.shape[2]
    hpb = heads_per_block
    assert H % hpb == 0, (H, hpb)
    assert k.shape == v.shape == (B, H, Skv, D)

    Sp = pl.cdiv(Skv, 128) * 128
    # k chunk size must divide the padded kv length
    bk = min(block_k, Sp)
    while Sp % bk:
        bk -= 128
    bq = min(block_q, pl.cdiv(S, 128) * 128)
    Sq = pl.cdiv(S, bq) * bq

    def pad_to(t, n):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n - t.shape[2]), (0, 0)))

    cdt = jnp.bfloat16
    qp = pad_to(q, Sq).astype(cdt)
    kp = pad_to(k, Sp).astype(cdt)
    vp = pad_to(v, Sp).astype(cdt)
    bias = jnp.where(jnp.arange(Sp) < Skv, 0.0, NEG_INF).astype(jnp.float32)
    bias = bias[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), block_k=bk,
                          n_chunks=Sp // bk, hpb=hpb),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        grid=(B, H // hpb, Sq // bq),
        in_specs=[
            pl.BlockSpec((1, hpb, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            # constant in i -> K/V stay resident across the q blocks of one
            # (batch, head-pack)
            pl.BlockSpec((1, hpb, Sp, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, Sp, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hpb, bq, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sp * D,
            bytes_accessed=B * H * (Sq * D * 4 + 2 * Sp * D * 2),
            transcendentals=B * H * Sq * Sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :, :S]
