"""Transformer stack (flax.linen) — the framework's generic 1D transformer.

Functional equivalent of the reference's vendored diffusers blocks
(reference: src/models/transformers.py:139-399 BasicTransformerBlock,
:912-1074 Transformer1D_nn): pre-LN self-attention, optional cross-attention
to conditioning tokens, GEGLU feed-forward, channel-first (B, C, S) in/out
with GroupNorm + proj residual wrapper.

TPU-first choices:
  * attention defaults to one fused dot-product-attention einsum chain (XLA
    fuses softmax(QK^T)V onto the MXU at these sequence lengths); an opt-in
    Pallas flash-attention path exists for long self-attention.
  * every weight carries flax LOGICAL AXIS names so the same module runs
    replicated on one chip or tensor-parallel over a 'model' mesh axis via
    parallel/mesh.py rules ('embed' stays replicated, 'heads'/'mlp' shard).
  * gradient checkpointing = nn.remat over blocks (reference toggles
    torch.utils.checkpoint per block, transformers.py:1044-1056).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = jnp.dtype


def _dense(features: int, axes, use_bias: bool = True, name: Optional[str] = None,
           dtype=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), axes),
        bias_init=nn.with_logical_partitioning(
            nn.initializers.zeros_init(), (axes[-1],)),
        name=name,
    )


FLASH_MIN_SEQ = 1024  # below this, materialized attention is fine


class _HeadsDense(nn.Module):
    """`nn.Dense(inner, use_bias=False)` twin emitting (B, H, T, D) directly.

    Identical parameter ('kernel' (C, inner), same logical axes) — only the
    compute differs: folding the head split into the projection dot lets the
    MXU write the head-major layout the attention kernels want. The explicit
    reshape+transpose after a (B, T, inner) dense cost ~19 ms/rollout of
    relayout fusions around the flash kernel (xprof, serving trace)."""

    inner: int
    heads: int
    axes: tuple
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         self.axes),
            (C, self.inner))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        D = self.inner // self.heads
        return jnp.einsum("btc,chd->bhtd", x,
                          kernel.reshape(C, self.heads, D))


class _OutDense(nn.Module):
    """`nn.Dense(out_dim)` twin consuming (B, H, S, D) head-major attention
    output: same params ('kernel' (inner, out), 'bias'), head merge folded
    into the output-projection dot (no (B,H,S,D)->(B,S,inner) relayout)."""

    out_dim: int
    heads: int
    head_dim: int
    axes: tuple
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(nn.initializers.lecun_normal(),
                                         self.axes),
            (inner, self.out_dim))
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         (self.axes[-1],)),
            (self.out_dim,))
        y, kernel, bias = nn.dtypes.promote_dtype(y, kernel, bias,
                                                  dtype=self.dtype)
        out = jnp.einsum("bhsd,hdo->bso", y,
                         kernel.reshape(self.heads, self.head_dim,
                                        self.out_dim))
        return out + bias


class Attention(nn.Module):
    """Multi-head attention, optionally cross (kv from `context`).

    Mirrors diffusers.Attention wiring: no qkv bias, output projection with
    bias, scale = head_dim**-0.5.

    Long self-attention sequences on TPU route through the Pallas flash
    attention kernel (never materializes the S x S logits — at the audio
    rollout's 6304 tokens those are ~640MB/layer of HBM traffic otherwise).
    This is the TPU answer to the reference's xformers/flash-attn toggles
    (transformers.py:31-90).
    """

    heads: int
    head_dim: int
    out_dim: int
    context_dim: Optional[int] = None
    dtype: Optional[Dtype] = None
    # Tuned on v5e at the audio rollout's (B=1, H=8, S=6304, D=64) shape
    # (tools/attn_probe.py): flash q1024/k1024 = 2.76 ms vs XLA bf16
    # materialized = 4.11 ms per layer. Opt-in per call site.
    use_flash: bool = False
    # Pallas kernel choice when use_flash: 'flash' (jax flash_attention,
    # differentiable — training path), 'flash2' (ops/flash2.py base-2
    # softmax fork of the same kernel, forward-only serving), 'splash'
    # (splash-attention MHA, forward-only serving; measured 4.55 vs 4.79
    # ms/layer at B=2 S=6304, tools/attn_probe.py), or 'serve'
    # (ops/serve_attention.py — K/V resident in VMEM, single-pass exact
    # softmax, forward-only).
    flash_impl: str = "flash"
    # Compute only the last q_tail query positions (keys/values full).
    q_tail: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        kv_src = x if context is None else context
        q_layer = _HeadsDense(inner, self.heads, ("embed", "heads"),
                              name="q", dtype=self.dtype)
        k_layer = _HeadsDense(inner, self.heads, ("embed", "heads"),
                              name="k", dtype=self.dtype)
        out_layer = _OutDense(self.out_dim, self.heads, self.head_dim,
                              ("heads", "embed"), name="out",
                              dtype=self.dtype)
        v = _HeadsDense(inner, self.heads, ("embed", "heads"), name="v",
                        dtype=self.dtype)(kv_src)               # (B,H,T,D)

        if kv_src.shape[1] == 1 and mask is None:
            # EXACT single-key shortcut (the audio rollout cross-attends to
            # ONE audio token per AR step): softmax over one key is
            # identically 1, so attention output == that key's value for
            # every query — q/k/logits fold away mathematically. The q/k
            # params are still registered (zero-cost dummy applications) so
            # checkpoints/imports keep their full layout.
            _ = q_layer(x[:, :1])
            _ = k_layer(kv_src[:, :1])
            q_len = x.shape[1] if self.q_tail is None else self.q_tail
            # project the ONE distinct row, then broadcast (dense and
            # broadcast commute — saves the (S, inner) @ (inner, out) matmul)
            out1 = out_layer(v)                                 # (B,1,out)
            return jnp.broadcast_to(out1, (x.shape[0], q_len, self.out_dim))

        q = q_layer(x if self.q_tail is None else x[:, -self.q_tail:])
        k = k_layer(kv_src)

        B, _, S, _ = q.shape
        scale = self.head_dim ** -0.5

        # cross-attention qualifies too (separate q/kv block plans); only
        # the kv length must also be long enough to be worth the kernel
        flash_ok = (self.use_flash and mask is None
                    and S >= FLASH_MIN_SEQ
                    and k.shape[2] >= FLASH_MIN_SEQ
                    and jax.default_backend() == "tpu")
        if flash_ok:
            impl = {"splash": self._splash,
                    "serve": self._serve,
                    "hpack": self._hpack,
                    "flash2": self._flash2}.get(self.flash_impl, self._flash)
            out = impl(q, k, v, scale)
        else:
            logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
            if mask is not None:
                logits = logits + mask
            # Softmax dtype follows the compute dtype (diffusers' default —
            # upcast_attention=False, transformers.py:233). In bf16 this
            # halves the S x S logits traffic, the bandwidth bottleneck at
            # the rollout's 6304-token sequences (max-subtraction inside
            # jax.nn.softmax keeps it stable).
            if self.dtype is None:
                logits = logits.astype(jnp.float32)
            probs = nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhst,bhtd->bhsd", probs, v.astype(probs.dtype))
        return out_layer(out)

    @staticmethod
    def _pad_block(S: int, max_block: int = 1280):
        """Pad plan for the Pallas kernels: the kernels compute the FULL
        padded S^2 (segment-id masking zeroes results but not work), so pad
        to the next 128 lane multiple and pick the largest block that
        divides it, instead of padding to a whole block multiple. At the
        rollout's S=6304 that is Sp=6400/block=1280 (vs the original
        7168/1024 — -21%% padded attention FLOPs; the B=2 block sweep
        measured q1280/k1280 4.07 ms vs q640 4.51, tools/attn_probe.py
        2026-08-19). Falls back to 512-blocks when the 128-multiple is
        block-hostile (e.g. 128 x prime)."""
        Sp = ((S + 127) // 128) * 128
        for b in range(max_block, 127, -128):
            if Sp % b == 0 and b >= 256:
                return Sp, b
        Sp = ((S + 511) // 512) * 512
        return Sp, 512

    @staticmethod
    def _flash2(q, k, v, scale):
        """Base-2 softmax flash (ops/flash2.py): stock kernel with exp->exp2
        and log2(e) folded into the query scale — mathematically identical,
        ~25% cheaper VPU transcendental. FORWARD-ONLY (serving); training
        keeps `flash` (the clone's backward assumes natural exp)."""
        from ..ops.flash2 import fold_scale_base2, get_exp2_module

        return Attention._flash(fold_scale_base2(q, scale), k, v, 1.0,
                                fa=get_exp2_module())

    @staticmethod
    def _flash(q, k, v, scale, fa=None):
        """(B, H, S, D) -> (B, H, S, D) via the Pallas TPU kernel; pads the
        sequence to a 128 multiple with segment-id masking."""
        if fa is None:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

        B, H, S, D = q.shape
        Skv = k.shape[2]
        Sp, BQ = Attention._pad_block(S)
        Skvp, BK = Attention._pad_block(Skv)

        def p(t, target):
            return jnp.pad(t, ((0, 0), (0, 0), (0, target - t.shape[2]),
                               (0, 0)))

        qh, kh, vh = p(q, Sp), p(k, Skvp), p(v, Skvp)
        seg_q = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
        seg_q = jnp.broadcast_to(seg_q[None], (B, Sp))
        seg_kv = jnp.where(jnp.arange(Skvp) < Skv, 1, 2).astype(jnp.int32)
        seg_kv = jnp.broadcast_to(seg_kv[None], (B, Skvp))
        # ALL block sizes (incl. backward dkv/dq) must be given or the
        # kernel refuses to differentiate (stage-2 training hits the bwd).
        bs = fa.BlockSizes(
            block_q=BQ, block_k_major=BK, block_k=BK, block_b=1,
            block_q_major_dkv=BQ, block_k_major_dkv=BK,
            block_k_dkv=BK, block_q_dkv=BQ,
            block_k_major_dq=BK, block_k_dq=BK, block_q_dq=BQ)
        out = fa.flash_attention(qh, kh, vh,
                                 segment_ids=fa.SegmentIds(q=seg_q, kv=seg_kv),
                                 sm_scale=scale, block_sizes=bs)
        return out[:, :, :S]

    @staticmethod
    def _hpack(q, k, v, scale):
        """Forward-only head-packed kernel (ops/hpack_attention.py): 2 heads
        per grid step, interleaved in the k-chunk loop so one head's VPU
        softmax overlaps the other's half-width (D=64) MXU dots."""
        from ..ops.hpack_attention import hpack_attention

        H = q.shape[1]
        hpb = 2 if H % 2 == 0 else 1
        return hpack_attention(q, k, v, scale=float(scale),
                               heads_per_block=hpb).astype(q.dtype)

    @staticmethod
    def _serve(q, k, v, scale):
        """Forward-only single-pass kernel (ops/serve_attention.py): K/V
        resident in VMEM, full-row softmax, pad keys masked by bias row."""
        from ..ops.serve_attention import serve_attention

        return serve_attention(q.astype(jnp.bfloat16),
                               k.astype(jnp.bfloat16),
                               v.astype(jnp.bfloat16),
                               scale=float(scale)).astype(q.dtype)

    @staticmethod
    def _splash(q, k, v, scale):
        """(B, H, S, D) -> (B, H, S, D) via splash-attention (forward-only
        serving kernel)."""
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm)

        B, H, S, D = q.shape
        Skv = k.shape[2]
        Sp, BQ = Attention._pad_block(S, max_block=640)
        Skvp, BK = Attention._pad_block(Skv, max_block=640)

        def p(t, target):
            return jnp.pad(t, ((0, 0), (0, 0), (0, target - t.shape[2]),
                               (0, 0)))

        qh, kh, vh = p(q, Sp), p(k, Skvp), p(v, Skvp)
        seg_q = jnp.where(jnp.arange(Sp) < S, 1, 2).astype(jnp.int32)
        seg_q = jnp.broadcast_to(seg_q[None], (B, Sp))
        seg_kv = jnp.where(jnp.arange(Skvp) < Skv, 1, 2).astype(jnp.int32)
        seg_kv = jnp.broadcast_to(seg_kv[None], (B, Skvp))
        mask = sm.MultiHeadMask([sm.FullMask((Sp, Skvp)) for _ in range(H)])
        bs = sk.BlockSizes(block_q=BQ, block_kv=BK,
                           block_kv_compute=BK)
        kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                    block_sizes=bs)

        def one(qb, kb, vb, sq, skv):
            return kernel(qb * scale, kb, vb,
                          segment_ids=sk.SegmentIds(q=sq, kv=skv))

        out = jax.vmap(one)(qh, kh, vh, seg_q, seg_kv)
        return out[:, :, :S]


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (diffusers FeedForward default): proj to 2*mult*dim, split,
    x * gelu(gate), project back."""

    dim: int
    mult: int = 4
    dtype: Optional[Dtype] = None
    # Serving knob: tanh-approximate gelu. Exact erf is the torch-import
    # default (diffusers GEGLU uses F.gelu, reference transformers.py:505
    # -527), but erf is ~2.4x the VPU cost of the whole MLP's matmuls at
    # serving scale (tools/refiner_probe 2026-08-19: 11.65 ms erf vs 7.23
    # tanh vs 6.78 identity on a (369k,1024) pair). Identical param tree.
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = _dense(inner * 2, ("embed", "mlp"), name="wi", dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=self.gelu_approx)
        return _dense(self.dim, ("mlp", "embed"), name="wo", dtype=self.dtype)(h)


class TransformerBlock(nn.Module):
    """Pre-LN block: self-attn -> (cross-attn) -> GEGLU FF, residuals."""

    dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: Optional[Dtype] = None
    use_flash: bool = False  # self-attention only; cross KV is tiny
    flash_impl: str = "flash"
    # When set, only the LAST q_tail query positions are computed (keys and
    # values still span the full sequence) and the output is (B, q_tail, C).
    # Exact for callers that discard the head of the final layer's output —
    # the audio rollout reads only its trailing S_tri+L tokens each AR step.
    q_tail: Optional[int] = None
    gelu_approx: bool = False  # see GEGLUFeedForward

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        if self.q_tail is not None:
            x = x[:, -self.q_tail:]
        x = x + Attention(self.heads, self.head_dim, self.dim,
                          dtype=self.dtype, use_flash=self.use_flash,
                          flash_impl=self.flash_impl,
                          q_tail=self.q_tail,
                          name="attn1")(h)
        if self.context_dim is not None:
            h = nn.LayerNorm(name="norm2", dtype=self.dtype)(x)
            x = x + Attention(self.heads, self.head_dim, self.dim,
                              context_dim=self.context_dim,
                              dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(name="norm3", dtype=self.dtype)(x)
        return x + GEGLUFeedForward(self.dim, dtype=self.dtype,
                                    gelu_approx=self.gelu_approx,
                                    name="ff")(h)


class Transformer1D(nn.Module):
    """Channel-first token transformer (reference Transformer1D_nn).

    Input/output (B, C, S); inside: GroupNorm(32) over C, project C ->
    heads*head_dim, N blocks, project back, residual add.
    """

    num_layers: int
    heads: int
    head_dim: int
    in_channels: int
    context_dim: Optional[int] = None
    norm_num_groups: int = 32
    remat: bool = True
    dtype: Optional[Dtype] = None
    use_flash: bool = False
    flash_impl: str = "flash"
    # When set, the output covers only the LAST final_tail sequence positions
    # ((B, C, final_tail)): the final block computes just those queries and
    # proj_out/residual are sliced to match. Exact for callers that discard
    # the leading positions (the audio AR rollout keeps only its trailing
    # S_tri+L tokens, models/audio_net.py).
    final_tail: Optional[int] = None
    gelu_approx: bool = False  # see GEGLUFeedForward

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """tokens: (B, C, S); context: (B, T, C_ctx) sequence-major."""
        residual = tokens
        # (B, C, S) -> (B, S, C); GroupNorm over channel groups x sequence,
        # same reduction set as torch GroupNorm on channel-first input.
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         name="norm")(tokens.swapaxes(1, 2))
        h = _dense(self.heads * self.head_dim, ("embed", "embed_inner"),
                   name="proj_in", dtype=self.dtype)(h)

        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=())
        for i in range(self.num_layers):
            tail = self.final_tail if i == self.num_layers - 1 else None
            h = block_cls(self.heads * self.head_dim, self.heads, self.head_dim,
                          context_dim=self.context_dim, dtype=self.dtype,
                          use_flash=self.use_flash, flash_impl=self.flash_impl,
                          q_tail=tail, gelu_approx=self.gelu_approx,
                          name=f"block_{i}")(h, context)

        h = _dense(self.in_channels, ("embed_inner", "embed"),
                   name="proj_out", dtype=self.dtype)(h)
        if self.final_tail is not None:
            residual = residual[:, :, -self.final_tail:]
        return h.swapaxes(1, 2) + residual
