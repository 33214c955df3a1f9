"""ops/serve_attention parity vs dense attention (interpret mode on CPU).

The serving kernel must match softmax(q k^T * scale) v with full-f32
softmax to ~bf16 round-off, for equal and unequal q/kv lengths (the final
audio-rollout layer truncates queries to the trailing S_tri+L positions,
models/transformer.py q_tail).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops import serve_attention as sa

pytestmark = pytest.mark.quick


def _dense_ref(q, k, v, scale):
    logits = jnp.einsum("bhsd,bhtd->bhst",
                        q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("sq,skv", [(384, 384), (200, 384), (384, 333)])
@pytest.mark.parametrize("use_exp2", [False, True])
def test_serve_attention_matches_dense(sq, skv, use_exp2, monkeypatch):
    # route pallas_call through the interpreter on CPU
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    B, H, D = 2, 3, 64
    q = jnp.asarray(rng.randn(B, H, sq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, skv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, skv, D), jnp.bfloat16)
    scale = D ** -0.5

    with pltpu.force_tpu_interpret_mode():
        out = sa.serve_attention(q, k, v, scale=scale, block_q=128,
                                 use_exp2=use_exp2)
    ref = _dense_ref(q, k, v, scale)
    assert out.shape == (B, H, sq, D)
    err = np.abs(out.astype(np.float32) - np.asarray(ref))
    # bf16 p/v matmul round-off; softmax itself is f32 in both
    assert err.max() < 2e-2, err.max()
    assert np.mean(err) < 2e-3, np.mean(err)


def test_serve_attention_pad_keys_do_not_leak(monkeypatch):
    """Keys beyond S_kv must get ~zero softmax weight: compare S_kv=300
    against the same computation with explicit dense slicing."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    B, H, D, S = 1, 2, 64, 300  # pads to 384
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    # huge values in what WOULD be the pad region if masking failed
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        out = sa.serve_attention(q, k, v, scale=D ** -0.5, block_q=128)
    ref = _dense_ref(q, k, v, D ** -0.5)
    err = np.abs(out.astype(np.float32) - np.asarray(ref))
    assert err.max() < 2e-2, err.max()
