"""ops/flash2: base-2 softmax fork of the stock flash-attention kernel.

Validates (a) the module clone is patched (exp -> exp2) without touching
the installed jax module, (b) the base-2 identity — folding log2(e) into
the query scale reproduces natural-exp softmax exactly — on the module's
own dense reference, and (c) the full Pallas kernel path in interpret
mode against dense attention, at an odd sequence length so the segment-id
pad masking is exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops import flash2

pytestmark = pytest.mark.quick


def test_clone_is_patched_and_stock_is_not():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    mod = flash2.get_exp2_module()
    assert mod is not fa
    assert mod.jnp.exp is jnp.exp2
    assert mod.jnp.float32 is jnp.float32  # passthrough attrs
    assert fa.jnp.exp is jnp.exp  # installed jax untouched
    assert flash2.get_exp2_module() is mod  # cached


def test_base2_identity_on_dense_reference():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    mod = flash2.get_exp2_module()
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 3, 96, 32
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    scale = D ** -0.5

    ref = fa.mha_reference_no_custom_vjp(q, k, v, sm_scale=scale)
    got = mod.mha_reference_no_custom_vjp(
        flash2.fold_scale_base2(q, scale), k, v, sm_scale=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_flash2_kernel_matches_dense_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from audio_motion_avatar_tpu.models.transformer import Attention

    rng = np.random.RandomState(1)
    B, H, S, D = 1, 2, 600, 64  # odd S: pads to 640, masked pad keys
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    scale = D ** -0.5

    logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    ref = jnp.einsum("bhst,bhtd->bhsd",
                     jax.nn.softmax(logits, axis=-1), v)
    with pltpu.force_tpu_interpret_mode():
        got = Attention._flash2(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
