"""Base-2 softmax fork of the stock Pallas TPU flash-attention kernel.

The audio rollout's flash self-attention (8 layers x 6 AR steps at
S=6304, D=64) sits at 39% of its MXU bound (BASELINE.md round-4
roofline); the gap is VPU softmax inside the kernel. tools/vpu_probe
measured `exp2` ~25% cheaper than `exp` elementwise on v5e, so this
module applies the FlashAttention-2 base-2 trick to the STOCK jax
kernel (the hand-written serve kernel already lost to it, round 3):

    softmax(s) = exp(s - m) / sum  =  exp2(s' - m') / sum'
    with  s' = s * log2(e)  folded into the query scale BEFORE the
    QK^T matmul, so the kernel's `exp` calls can become `exp2` with
    zero extra in-kernel work (and the in-kernel `s *= sm_scale`
    multiply on every (block_q, block_k) logits tile disappears too,
    since sm_scale becomes 1.0).

Rather than copying the 1.7k-line kernel, we load a SECOND instance of
jax's own `flash_attention` module and swap its module-global `jnp`
for a proxy whose `.exp` is `jnp.exp2` — every `jnp.exp(s - m)` /
`jnp.exp(m_prev - m_next)` site in the kernel switches base while the
rest of the module is byte-identical to the installed jax.

FORWARD ONLY: the cloned backward recomputes p in base 2 consistently,
but its ds/dq/dk math assumes d(exp x)/dx = exp x, which is off by a
ln(2) factor in base 2. Serving never differentiates through this;
training keeps the stock kernel (`audio_attn_impl: flash`).

Replaces: the reference's xformers/flash-attn serving toggles
(/root/reference/src/models/transformers.py:31-90) — there is no
CUDA-side equivalent of this rewrite; it is a TPU VPU-pressure fix.
"""

from __future__ import annotations

import importlib.util
import sys

import jax.numpy as jnp

LOG2E = 1.4426950408889634  # log2(e)

_CLONE = None


class _Exp2Numpy:
    """Attribute proxy over jax.numpy with `exp` rebound to `exp2`."""

    def __getattr__(self, name):
        if name == "exp":
            return jnp.exp2
        return getattr(jnp, name)


def get_exp2_module():
    """The exp2-patched clone of jax's flash_attention module (cached)."""
    global _CLONE
    if _CLONE is None:
        from jax.experimental.pallas.ops.tpu import flash_attention as _fa

        spec = importlib.util.spec_from_file_location(
            "audio_motion_avatar_tpu.ops._flash_attention_exp2",
            _fa.__file__)
        mod = importlib.util.module_from_spec(spec)
        # dataclass field resolution looks the module up in sys.modules
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        mod.jnp = _Exp2Numpy()
        _CLONE = mod
    return _CLONE


def fold_scale_base2(q, sm_scale):
    """Pre-scale q by sm_scale*log2(e) so the kernel runs with
    sm_scale=1.0 in base-2 space. Keeps q's dtype (one bf16 rounding of
    the query, ~2^-9 relative — inside the serving parity budget; the
    stock path rounds the f32 logits through the same bf16 q anyway)."""
    return (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)
