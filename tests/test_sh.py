import pytest
import numpy as np
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import sh


def test_deg0_constant():
    coeffs = jnp.ones((5, 3, 1))
    dirs = jnp.asarray(np.random.RandomState(0).randn(5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.RandomState(1).rand(10, 3).astype(np.float32))
    back = sh.sh_to_rgb(sh.rgb_to_sh(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)


def test_orthogonality_monte_carlo():
    """SH basis functions are orthonormal over the sphere: check a few pairs
    by Monte-Carlo integration (loose tolerance)."""
    rng = np.random.RandomState(0)
    n = 200000
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dirs = jnp.asarray(v.astype(np.float32))

    def basis(i):
        c = np.zeros((1, 1, 16), np.float32)
        c[..., i] = 1.0
        return np.asarray(sh.eval_sh(3, jnp.asarray(np.broadcast_to(c, (n, 1, 16))), dirs))[:, 0]

    b0 = basis(0)
    b2 = basis(2)
    b6 = basis(6)
    sphere = 4 * np.pi
    # <b_i, b_j> over sphere = delta_ij
    assert abs(np.mean(b0 * b0) * sphere - 1.0) < 0.05
    assert abs(np.mean(b2 * b2) * sphere - 1.0) < 0.05
    assert abs(np.mean(b6 * b6) * sphere - 1.0) < 0.05
    assert abs(np.mean(b0 * b2) * sphere) < 0.05
    assert abs(np.mean(b2 * b6) * sphere) < 0.05


def test_deg4_runs():
    coeffs = jnp.asarray(np.random.RandomState(2).randn(7, 3, 25).astype(np.float32))
    dirs = jnp.asarray([[0.0, 0.0, 1.0]] * 7)
    out = sh.eval_sh(4, coeffs, dirs)
    assert out.shape == (7, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_sh_color_branch_deg0_matches_rgb_path():
    """render_one(sh_degree=0) with RGB2SH-converted coefficients must equal
    the plain RGB path (the reference's rgb-vs-SH branch at deg 0,
    renderer.py:539-547)."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import splat
    from audio_motion_avatar_tpu.ops.sh import rgb_to_sh

    rng = np.random.RandomState(7)
    n = 48
    xyz = jnp.asarray((rng.randn(n, 3) * 0.4).astype(np.float32))
    rot = rng.randn(n, 4).astype(np.float32)
    rot[:, 0] += 3.0
    s = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
    o = jnp.asarray(rng.randn(n).astype(np.float32))
    c = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.8 + 0.1)
    K = jnp.asarray([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    E = jnp.eye(4).at[2, 3].set(2.0)

    img_rgb = np.asarray(splat.render_one(xyz, jnp.asarray(rot), s, o, c,
                                          K, E, 64, 64))
    sh0 = rgb_to_sh(c)  # (n, 3) = flat coefficients for deg 0
    img_sh = np.asarray(splat.render_one(xyz, jnp.asarray(rot), s, o, sh0,
                                         K, E, 64, 64, sh_degree=0))
    np.testing.assert_allclose(img_sh, img_rgb, atol=1e-5)


@pytest.mark.slow
def test_sh_color_branch_deg1_view_dependent():
    """At deg>=1 the color must change with the viewing direction."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import splat

    n = 8
    rng = np.random.RandomState(8)
    xyz = jnp.asarray((rng.randn(n, 3) * 0.2).astype(np.float32))
    rot = np.tile([[1.0, 0, 0, 0]], (n, 1)).astype(np.float32)
    s = jnp.full((n, 3), 2.0)
    o = jnp.full((n,), 4.0)
    shs = jnp.asarray(rng.randn(n, 12).astype(np.float32) * 0.3)  # deg 1
    K = jnp.asarray([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    E1 = jnp.eye(4).at[2, 3].set(2.0)
    # opposite side: rotate 180 deg about y
    R = jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    E2 = jnp.eye(4).at[:3, :3].set(R).at[2, 3].set(2.0)

    i1 = np.asarray(splat.render_one(xyz, jnp.asarray(rot), s, o, shs,
                                     K, E1, 64, 64, sh_degree=1))
    i2 = np.asarray(splat.render_one(xyz, jnp.asarray(rot), s, o, shs,
                                     K, E2, 64, 64, sh_degree=1))
    assert np.isfinite(i1).all() and np.isfinite(i2).all()
    # same blob seen from opposite sides -> different SH colors
    assert np.abs(i1 - i2).max() > 1e-3
