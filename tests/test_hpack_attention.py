"""ops/hpack_attention parity vs dense attention (interpret mode on CPU).

The head-packed serving kernel must match softmax(q k^T * scale) v to bf16
round-off for every (heads_per_block, block, ragged-length) combination the
audio rollout can hit (models/transformer.py serving shapes: H=8, D=64,
S=6304 padded to 6400).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops.hpack_attention import hpack_attention

pytestmark = pytest.mark.quick


def _dense_ref(q, k, v, scale):
    logits = jnp.einsum("bhsd,bhtd->bhst",
                        q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("sq,skv", [(384, 384), (200, 384), (384, 333)])
@pytest.mark.parametrize("hpb", [1, 2, 4])
def test_hpack_matches_dense(sq, skv, hpb):
    rng = np.random.RandomState(0)
    B, H, D = 2, 4, 64
    q = jnp.asarray(rng.randn(B, H, sq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, skv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, skv, D), jnp.bfloat16)
    scale = D ** -0.5

    out = hpack_attention(q, k, v, scale=scale, block_q=128, block_k=256,
                          heads_per_block=hpb, interpret=True)
    ref = _dense_ref(q, k, v, scale)
    assert out.shape == (B, H, sq, D)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert d < 3e-2, d


def test_hpack_multi_chunk_online_softmax():
    """Several k chunks force the running-max/renormalize path."""
    rng = np.random.RandomState(1)
    B, H, D = 1, 2, 64
    S = 640
    q = jnp.asarray(rng.randn(B, H, S, D) * 2.0, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D) * 2.0, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    out = hpack_attention(q, k, v, scale=0.125, block_q=128, block_k=128,
                          heads_per_block=2, interpret=True)
    ref = _dense_ref(q, k, v, 0.125)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert d < 3e-2, d
