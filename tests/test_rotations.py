import numpy as np
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops import rotations as R


def random_rotmats(rng, n):
    """Proper random rotations via QR."""
    A = rng.randn(n, 3, 3)
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q.astype(np.float32)


def test_axis_angle_matrix_roundtrip(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    m = R.axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = R.matrix_to_axis_angle(m)
    m2 = R.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_axis_angle_to_matrix_is_rotation(rng):
    aa = rng.randn(32, 3).astype(np.float32) * 3.0
    m = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
    eye = np.eye(3)
    for i in range(32):
        np.testing.assert_allclose(m[i] @ m[i].T, eye, atol=1e-5)
        assert np.linalg.det(m[i]) > 0.99


def test_axis_angle_small_angle():
    aa = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
    m = np.asarray(R.axis_angle_to_matrix(aa))
    np.testing.assert_allclose(m[1], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(m[0], np.eye(3), atol=1e-6)


def test_known_rotation_90deg_z():
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    m = np.asarray(R.axis_angle_to_matrix(aa))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_quaternion_matrix_roundtrip(rng):
    mats = random_rotmats(rng, 64)
    q = R.matrix_to_quaternion(jnp.asarray(mats))
    m2 = np.asarray(R.quaternion_to_matrix(q))
    np.testing.assert_allclose(mats, m2, atol=1e-5)
    # w >= 0 canonical form
    assert np.all(np.asarray(q)[:, 0] >= -1e-7)


def test_quaternion_axis_angle_roundtrip(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    q = R.axis_angle_to_quaternion(jnp.asarray(aa))
    aa2 = np.asarray(R.quaternion_to_axis_angle(q))
    m1 = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
    m2 = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa2)))
    np.testing.assert_allclose(m1, m2, atol=1e-5)


def test_rotation_6d(rng):
    mats = random_rotmats(rng, 64)
    d6 = R.matrix_to_rotation_6d(jnp.asarray(mats))
    m2 = np.asarray(R.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(mats, m2, atol=1e-5)


def test_rotation_6d_gram_schmidt(rng):
    d6 = rng.randn(32, 6).astype(np.float32)
    m = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
    eye = np.eye(3)
    for i in range(32):
        np.testing.assert_allclose(m[i] @ m[i].T, eye, atol=1e-5)
        assert np.linalg.det(m[i]) > 0.99


@pytest.mark.parametrize("shape", [(3,), (2, 5, 3)])
def test_broadcasting(rng, shape):
    aa = rng.randn(*shape).astype(np.float32)
    m = R.axis_angle_to_matrix(jnp.asarray(aa))
    assert m.shape == shape[:-1] + (3, 3)
