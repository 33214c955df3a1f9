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
