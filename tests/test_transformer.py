import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.models.transformer import (Attention,
                                                        GEGLUFeedForward,
                                                        Transformer1D)


def test_transformer1d_channel_first_contract():
    m = Transformer1D(num_layers=2, heads=2, head_dim=8, in_channels=32,
                      context_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 10).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, ctx)
    y = m.apply(v, x, ctx)
    assert y.shape == x.shape


def test_context_changes_output():
    m = Transformer1D(num_layers=1, heads=2, head_dim=8, in_channels=32,
                      context_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 6).astype(np.float32))
    c1 = jnp.zeros((1, 4, 16))
    c2 = jnp.ones((1, 4, 16))
    v = m.init(jax.random.PRNGKey(0), x, c1)
    y1 = m.apply(v, x, c1)
    y2 = m.apply(v, x, c2)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-5


def test_residual_wrapper():
    """Zero-ish inner weights -> output ~ input (residual path)."""
    m = Transformer1D(num_layers=1, heads=2, head_dim=8, in_channels=32,
                      remat=False)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 6).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, v)
    y = m.apply(zeroed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_remat_matches_no_remat():
    kw = dict(num_layers=2, heads=2, head_dim=8, in_channels=32)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 32, 6).astype(np.float32))
    m1 = Transformer1D(remat=True, **kw)
    m2 = Transformer1D(remat=False, **kw)
    v = m1.init(jax.random.PRNGKey(0), x)
    y1 = m1.apply(v, x)
    y2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_attention_cross_shape():
    m = Attention(heads=2, head_dim=8, out_dim=32, context_dim=16)
    x = jnp.zeros((1, 6, 32))
    ctx = jnp.zeros((1, 9, 16))
    v = m.init(jax.random.PRNGKey(0), x, ctx)
    y = m.apply(v, x, ctx)
    assert y.shape == (1, 6, 32)


def test_geglu():
    m = GEGLUFeedForward(dim=16)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 3, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # GEGLU kernel wi maps 16 -> 128 (2 * 4 * 16)
    assert v["params"]["wi"]["kernel"].value.shape == (16, 128) \
        if hasattr(v["params"]["wi"]["kernel"], "value") else \
        v["params"]["wi"]["kernel"].shape == (16, 128)


def test_cross_attention_single_token_shortcut_exact():
    """Context length 1: the shortcut (broadcast v) must equal the general
    softmax path bit-for-bit in math (softmax over one key == 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_motion_avatar_tpu.models.transformer import Attention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 16).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 1, 12).astype(np.float32))
    from audio_motion_avatar_tpu.parallel.mesh import unbox
    attn = Attention(heads=2, head_dim=8, out_dim=16, context_dim=12)
    v = unbox(attn.init(jax.random.PRNGKey(0), x, ctx))
    out = attn.apply(v, x, ctx)

    # general formula from the same params
    p = v["params"]
    q = x @ p["q"]["kernel"]
    k = ctx @ p["k"]["kernel"]
    vv = ctx @ p["v"]["kernel"]
    B, S, _ = q.shape
    qh = q.reshape(B, S, 2, 8)
    kh = k.reshape(B, 1, 2, 8)
    vh = vv.reshape(B, 1, 2, 8)
    logits = jnp.einsum("bshd,bthd->bhst", qh, kh) * (8 ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhst,bthd->bshd", probs, vh).reshape(B, S, 16)
    ref = ref @ p["out"]["kernel"] + p["out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # params must keep the full q/k/v/out layout for checkpoint compat
    assert set(p.keys()) == {"q", "k", "v", "out"}


def test_flash_block_sizes_fully_specified_for_backward():
    """The tuned flash BlockSizes must specify EVERY backward block size —
    the kernel refuses differentiation otherwise, which would break stage-2
    training on TPU (this test guards the config; the kernel itself is
    TPU-only)."""
    import dataclasses
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    BLOCK = 1024
    bs = fa.BlockSizes(
        block_q=BLOCK, block_k_major=BLOCK, block_k=BLOCK, block_b=1,
        block_q_major_dkv=BLOCK, block_k_major_dkv=BLOCK,
        block_k_dkv=BLOCK, block_q_dkv=BLOCK,
        block_k_major_dq=BLOCK, block_k_dq=BLOCK, block_q_dq=BLOCK)
    for f in dataclasses.fields(bs):
        assert getattr(bs, f.name) is not None, f.name
    assert bs.has_backward_blocks

    # and the source wires exactly this shape of BlockSizes
    import inspect
    from audio_motion_avatar_tpu.models import transformer as tfm
    src = inspect.getsource(tfm.Attention._flash)
    for field in ("block_q_dkv", "block_k_dq", "block_q_major_dkv"):
        assert field in src, f"_flash must set {field}"


def test_final_tail_matches_full_output_tail():
    """final_tail computes exactly the tail slice of the full forward
    (same params: the tail variant only skips discarded query positions)."""
    full = Transformer1D(num_layers=2, heads=2, head_dim=8, in_channels=32,
                         context_dim=16)
    tail = Transformer1D(num_layers=2, heads=2, head_dim=8, in_channels=32,
                         context_dim=16, final_tail=6)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 10).astype(np.float32))
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 1, 16).astype(np.float32))
    v = full.init(jax.random.PRNGKey(0), x, ctx)
    y_full = full.apply(v, x, ctx)
    y_tail = tail.apply(v, x, ctx)
    assert y_tail.shape == (2, 32, 6)
    np.testing.assert_allclose(np.asarray(y_tail),
                               np.asarray(y_full[:, :, -6:]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_flash_pad_block_plan():
    """Pad plan picks the next 128 multiple and the largest dividing block
    (>=256), falling back to 512-blocks for block-hostile lengths."""
    from audio_motion_avatar_tpu.models.transformer import Attention

    assert Attention._pad_block(6304) == (6400, 1280)  # the audio rollout
    # (1280 over 640: B=2 block sweep, tools/attn_probe.py 2026-08-19)
    assert Attention._pad_block(3152) == (3200, 640)   # fusion q
    assert Attention._pad_block(4096) == (4096, 1024)  # sapiens tokens
    assert Attention._pad_block(512) == (512, 512)
    assert Attention._pad_block(1024) == (1024, 1024)
    assert Attention._pad_block(1664) == (2048, 512)   # 128*13: no divisor
    for s in (6304, 3152, 4096, 512, 1024, 1664, 100, 129, 7777):
        sp, b = Attention._pad_block(s)
        assert sp >= s and sp % 128 == 0 and sp % b == 0 and b % 128 == 0


def test_gelu_approx_knob_same_params():
    """gelu_approx=True (serving knob) keeps the exact param tree and
    changes outputs only by the tanh-vs-erf gelu approximation error."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_motion_avatar_tpu.models.transformer import Transformer1D

    kw = dict(num_layers=1, heads=2, head_dim=8, in_channels=32,
              norm_num_groups=4)
    a = Transformer1D(**kw)
    b = Transformer1D(**kw, gelu_approx=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 24), jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(b.init(jax.random.PRNGKey(0), x)))
    oa = a.apply(va, x)
    ob = b.apply(va, x)
    d = float(jnp.abs(oa - ob).max())
    assert 0 < d < 5e-2, d
