import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.models.ptv3 import PointRefiner


def make_refiner(n=300, in_dim=12):
    rng = np.random.RandomState(0)
    pts = jnp.asarray((rng.randn(2, n, 3) * 0.4).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, n, in_dim).astype(np.float32))
    model = PointRefiner(
        in_dim=in_dim, out_dim=32,
        enc_channels=(16, 32, 64), enc_depths=(1, 1, 1), enc_heads=(2, 2, 4),
        dec_channels=(16, 32), dec_depths=(1, 1), dec_heads=(2, 2),
        patch_size=64, grid_resolution=100.0)
    variables = model.init(jax.random.PRNGKey(0), pts, feats)
    return model, variables, pts, feats


def test_shapes_and_finite():
    model, variables, pts, feats = make_refiner()
    out = model.apply(variables, pts, feats)
    assert out.shape == (2, 300, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_permutation_equivariance():
    """Serialization sorts points internally, so permuting the input cloud
    must permute the output identically (up to fp noise from different
    reduction orders)."""
    model, variables, pts, feats = make_refiner()
    out1 = np.asarray(model.apply(variables, pts, feats))
    perm = np.random.RandomState(1).permutation(300)
    out2 = np.asarray(model.apply(variables, pts[:, perm], feats[:, perm]))
    np.testing.assert_allclose(out1[:, perm], out2, atol=2e-4)


def test_depends_on_geometry():
    """Moving points must change features (attention grouping + cpe)."""
    model, variables, pts, feats = make_refiner()
    out1 = np.asarray(model.apply(variables, pts, feats))
    out2 = np.asarray(model.apply(variables, pts * 0.2, feats))
    assert np.abs(out1 - out2).max() > 1e-3


def test_grad_flows():
    model, variables, pts, feats = make_refiner()

    def loss(feats):
        return (model.apply(variables, pts, feats) ** 2).mean()

    g = np.asarray(jax.grad(loss)(feats))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_full_scale_shapes():
    """Reference-scale config on a smaller N to keep CPU time sane."""
    rng = np.random.RandomState(2)
    n = 2048
    pts = jnp.asarray((rng.randn(1, n, 3) * 0.4).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, n, 24).astype(np.float32))
    model = PointRefiner(
        in_dim=24, out_dim=256,
        enc_channels=(32, 64, 128, 256, 512), enc_depths=(1, 1, 1, 1, 1),
        enc_heads=(2, 4, 8, 16, 32),
        dec_channels=(256, 128, 256, 512), dec_depths=(1, 1, 1, 1),
        dec_heads=(4, 4, 8, 16),
        patch_size=512, grid_resolution=100.0)
    variables = model.init(jax.random.PRNGKey(0), pts, feats)
    out = model.apply(variables, pts, feats)
    assert out.shape == (1, n, 256)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.quick
def test_mask_sort_invariance():
    """Every serialization order sorts padding (code 2^30) last while
    storage is valid-first, so mask[perm] == mask — the identity the
    refiner relies on to skip per-block mask gathers."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import serialization as ser

    rng = np.random.RandomState(3)
    N, N_pad = 700, 1024
    pts = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 1.2)
    pts = jnp.pad(pts, ((0, N_pad - N), (0, 0)))
    mask = jnp.arange(N_pad) < N
    grid = ser.grid_coords(pts, 100.0)
    for o in ser.ORDERS:
        code = ser.encode(grid, o)
        assert int(code[:N].max()) < 2 ** 30
        code = jnp.where(mask, code, jnp.int32(2 ** 30))
        perm = jnp.argsort(code)
        np.testing.assert_array_equal(np.asarray(mask)[np.asarray(perm)],
                                      np.asarray(mask))


@pytest.mark.quick
def test_patch_attention_matches_flax_mha():
    """_PatchAttention (dense path) must reproduce
    nn.MultiHeadDotProductAttention bit-for-bit semantics with the SAME
    param tree, masked rows included."""
    import flax.linen as nn
    from audio_motion_avatar_tpu.models.ptv3 import _PatchAttention

    G, P, C, H = 3, 64, 32, 4
    rng = np.random.RandomState(0)
    hq = jnp.asarray(rng.randn(G, P, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(G, P) < 0.8)

    new = _PatchAttention(C, H)
    v = new.init(jax.random.PRNGKey(0), hq, mask)
    out_new = new.apply(v, hq, mask)

    old = nn.MultiHeadDotProductAttention(num_heads=H)
    out_old = old.apply(v, hq, hq, mask=mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.quick
def test_serial_cpe_matches_depthwise_conv():
    """_SerialCpe (shifted multiplies) == nn.Conv depthwise window 3,
    identical params."""
    import flax.linen as nn
    from audio_motion_avatar_tpu.models.ptv3 import _SerialCpe

    N, C = 200, 16
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(N, C).astype(np.float32))
    new = _SerialCpe(C)
    v = new.init(jax.random.PRNGKey(0), x)
    out_new = new.apply(v, x)
    conv = nn.Conv(C, kernel_size=(3,), feature_group_count=C)
    out_old = conv.apply(v, x[None])[0]
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               rtol=1e-5, atol=1e-5)
