"""Winograd F(2x2,3x3) conv: parity with the direct XLA conv.

Runs the actual Pallas kernel through the interpreter on CPU (same pattern
as test_splat_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_motion_avatar_tpu.ops import winograd as W

# slow tier: winograd is a PARKED kernel (measured loss on-chip,
# BASELINE.md) and its variant compiles dominate the quick budget
pytestmark = pytest.mark.slow


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale)


@pytest.mark.parametrize("padding,shape", [
    ("SAME", (2, 16, 16, 128)),
    ("SAME", (1, 32, 8, 128)),
    ("VALID", (3, 18, 18, 128)),
    ("VALID", (2, 10, 18, 128)),
])
def test_matches_direct_conv_fp32(padding, shape):
    x = _rand(shape, 0)
    w = _rand((3, 3, shape[-1], 128), 1, 0.1)
    b = _rand((128,), 2)
    ref = W.conv3x3_xla(x, w, b, padding)
    out = W._winograd_fwd_impl(x, w, b, padding, interpret=True)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_matches_direct_conv_bf16_tolerance():
    """bf16 transforms stay within the same error class as the direct bf16
    conv (both measured against the fp32 direct conv)."""
    x32 = _rand((2, 16, 16, 128), 3)
    w32 = _rand((3, 3, 128, 128), 4, 0.1)
    b32 = _rand((128,), 5)
    exact = np.asarray(W.conv3x3_xla(x32, w32, b32, "SAME"), np.float32)
    x, w, b = (t.astype(jnp.bfloat16) for t in (x32, w32, b32))
    direct = np.asarray(W.conv3x3_xla(x, w, b, "SAME"), np.float32)
    wino = np.asarray(
        W._winograd_fwd_impl(x, w, b, "SAME", interpret=True), np.float32)
    err_direct = np.abs(direct - exact).mean()
    err_wino = np.abs(wino - exact).mean()
    scale = np.abs(exact).mean()
    # same error class: winograd-bf16 within 4x of direct-bf16 rounding
    assert err_wino < 4 * err_direct + 1e-6, (err_wino, err_direct, scale)


def test_block_sizes_cover_serving_shapes():
    # dense up_2 planes and the sparse final-level tile windows
    for NB, Hh, Wh in [(18, 128, 128), (4608, 8, 8), (18, 64, 64)]:
        nb, th = W._pick_block(NB, Hh, Wh)
        assert NB % nb == 0 and Hh % th == 0, (NB, Hh, Wh, nb, th)
        assert nb * th * Wh <= 1024


def test_gradients_flow():
    x = _rand((1, 8, 8, 128), 6)
    w = _rand((3, 3, 128, 128), 7, 0.1)
    b = _rand((128,), 8)

    def loss_wino(x, w, b):
        return jnp.sum(W.winograd_conv3x3(x, w, b, "SAME") ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(W.conv3x3_xla(x, w, b, "SAME") ** 2)

    g1 = jax.grad(loss_wino, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


def test_upsampler_winograd_matches_xla_dense_and_sparse():
    """TriplaneUpsampler with conv_impl='winograd': identical param tree and
    (fp32) matching outputs on both the dense path and the sparse-final
    path (tile-window VALID convs)."""
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    from audio_motion_avatar_tpu.ops import triplane as T

    C, R, nb = 128, 8, 1
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(1, 3, C, R, R).astype(np.float32))
    xla_up = TriplaneUpsampler(C, nb, channels_last=True)
    win_up = TriplaneUpsampler(C, nb, channels_last=True,
                               conv_impl="winograd")
    import flax.linen as nn
    # unbox: the XLA conv path carries TP logical-axis metadata boxes;
    # values (and unboxed structure) are identical to the winograd twin
    v = nn.meta.unbox(xla_up.init(jax.random.PRNGKey(0), planes))
    v2 = nn.meta.unbox(win_up.init(jax.random.PRNGKey(0), planes))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    out_x = np.asarray(xla_up.apply(v, planes))
    out_w = np.asarray(win_up.apply(v, planes))
    np.testing.assert_allclose(out_w, out_x, rtol=2e-4, atol=2e-4)

    # sparse final level: 20x20 -> VALID convs on tile windows
    pts = jnp.asarray((rng.rand(1, 64, 3) * 2 - 1).astype(np.float32)) * 1.3
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    sp_x = TriplaneUpsampler(C, nb, sparse_final=True).apply(
        v, planes, points_uv=uv)
    sp_w = TriplaneUpsampler(C, nb, sparse_final=True,
                             conv_impl="winograd").apply(
        v, planes, points_uv=uv)
    feats_x = np.asarray(T.sample_triplane_sparse(sp_x, pts, 1.4))
    feats_w = np.asarray(T.sample_triplane_sparse(sp_w, pts, 1.4))
    np.testing.assert_allclose(feats_w, feats_x, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("padding,shape", [
    ("SAME", (2, 16, 16, 128)),
    ("VALID", (3, 18, 18, 128)),
])
def test_gn_fused_matches_unfused(padding, shape):
    """conv3x3(relu(a*x+c)) fused kernel == normalize-then-direct-conv."""
    x = _rand(shape, 10)
    w = _rand((3, 3, shape[-1], 128), 11, 0.1)
    b = _rand((128,), 12)
    a = _rand((shape[0], shape[-1]), 13, 0.3) + 1.0
    c = _rand((shape[0], shape[-1]), 14, 0.3)
    ref = W.conv3x3_gn_relu_xla(x, w, b, a, c, padding)
    out = W._winograd_gn_fwd_impl(x, w, b, a, c, padding, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gn_affine_matches_groupnorm():
    import flax.linen as nn
    x = _rand((2, 8, 8, 128), 15)
    scale = _rand((128,), 16, 0.2) + 1.0
    bias = _rand((128,), 17, 0.2)
    gn = nn.GroupNorm(num_groups=32)
    ref = np.maximum(np.asarray(gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x)), 0.0)
    a, c = W.gn_affine(x, scale, bias, 32)
    out = np.maximum(np.asarray(x) * np.asarray(a)[:, None, None, :]
                     + np.asarray(c)[:, None, None, :], 0.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_resblock_winograd_gn_matches_xla():
    """ResBlock conv_impl='winograd_gn' == the plain GroupNorm+conv block
    (fp32), with the identical param tree."""
    from audio_motion_avatar_tpu.models.upsampler import ResBlock
    x = _rand((2, 16, 16, 128), 18)
    rb_x = ResBlock(128)
    rb_w = ResBlock(128, conv_impl="winograd_gn")
    import flax.linen as nn
    v = nn.meta.unbox(rb_x.init(jax.random.PRNGKey(0), x))
    v2 = nn.meta.unbox(rb_w.init(jax.random.PRNGKey(0), x))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    # non-trivial norm/conv params
    import jax.tree_util as jtu
    leaves, treedef = jtu.tree_flatten(v)
    rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    v = jtu.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(r, l.shape, l.dtype)
        for l, r in zip(leaves, rngs)])
    out_x = np.asarray(rb_x.apply(v, x))
    out_w = np.asarray(rb_w.apply(v, x))
    np.testing.assert_allclose(out_w, out_x, rtol=3e-4, atol=3e-4)


def test_tpu_cross_lowering_serving_shapes():
    """jax.export cross-platform lowering runs the Pallas->Mosaic lowering
    rules without a TPU attached — catches kernel constructs Mosaic rejects
    (e.g. stride-2 slices on >2D operands lower as unsupported gathers;
    found this way) before burning a TPU sweep on them."""
    w = jnp.zeros((3, 3, 256, 256), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    shapes = [((18, 256, 256, 256), "SAME"),
              ((18, 64, 64, 256), "SAME"),
              ((4608, 18, 18, 256), "VALID"),
              ((4608, 20, 20, 256), "VALID")]
    for shape, padding in shapes:
        x = jnp.zeros(shape, jnp.bfloat16)
        jax.export.export(
            jax.jit(lambda x_, w_, b_: W._winograd_fwd_impl(
                x_, w_, b_, padding, interpret=False)),
            platforms=["tpu"])(x, w, b)
    x = jnp.zeros((18, 256, 256, 256), jnp.bfloat16)
    a = jnp.zeros((18, 256), jnp.float32)
    c = jnp.zeros((18, 256), jnp.float32)
    jax.export.export(
        jax.jit(lambda x_, w_, b_, a_, c_: W._winograd_gn_fwd_impl(
            x_, w_, b_, a_, c_, "SAME", interpret=False)),
        platforms=["tpu"])(x, w, b, a, c)


def test_upsampler_winograd_gn_matches_xla():
    """conv_impl='winograd_gn' through the full TriplaneUpsampler (dense
    levels fused, sparse final level on plain winograd convs)."""
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    from audio_motion_avatar_tpu.ops import triplane as T

    C, R, nb = 128, 8, 2
    rng = np.random.RandomState(1)
    planes = jnp.asarray(rng.randn(1, 3, C, R, R).astype(np.float32))
    xla_up = TriplaneUpsampler(C, nb, channels_last=True)
    gn_up = TriplaneUpsampler(C, nb, channels_last=True,
                              conv_impl="winograd_gn")
    import flax.linen as nn
    v = nn.meta.unbox(xla_up.init(jax.random.PRNGKey(0), planes))
    v2 = nn.meta.unbox(gn_up.init(jax.random.PRNGKey(0), planes))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out_x = np.asarray(xla_up.apply(v, planes))
    out_g = np.asarray(gn_up.apply(v, planes))
    np.testing.assert_allclose(out_g, out_x, rtol=3e-4, atol=3e-4)

    pts = jnp.asarray((rng.rand(1, 64, 3) * 2 - 1).astype(np.float32)) * 1.3
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    sp_x = TriplaneUpsampler(C, nb, sparse_final=True).apply(
        v, planes, points_uv=uv)
    sp_g = TriplaneUpsampler(C, nb, sparse_final=True,
                             conv_impl="winograd_gn").apply(
        v, planes, points_uv=uv)
    feats_x = np.asarray(T.sample_triplane_sparse(sp_x, pts, 1.4))
    feats_g = np.asarray(T.sample_triplane_sparse(sp_g, pts, 1.4))
    np.testing.assert_allclose(feats_g, feats_x, rtol=3e-4, atol=3e-4)
