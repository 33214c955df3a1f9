import numpy as np
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import mesh_utils as M
from audio_motion_avatar_tpu.utils.losses import chamfer_distance


TET_V = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
TET_F = np.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)


def test_face_normals_direction():
    fn = np.asarray(M.face_normals(TET_V, TET_F))
    # face (0,2,1) lies in z=0 plane, wound to face -z
    np.testing.assert_allclose(fn[0] / np.linalg.norm(fn[0]), [0, 0, -1], atol=1e-6)


def test_vertex_normals_unit():
    vn = np.asarray(M.vertex_normals(TET_V, TET_F))
    np.testing.assert_allclose(np.linalg.norm(vn, axis=-1), 1.0, atol=1e-5)


def test_laplacian_zero_for_centroid():
    """A vertex exactly at its neighbors' centroid contributes 0."""
    # square with center: center at mean of 4 corners
    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                         [0.5, 0.5, 0.0]])
    faces = np.asarray([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], np.int32)
    nbr, mask = M.build_laplacian(5, faces)
    loss_flat = float(M.laplacian_smoothing_loss(verts, nbr, mask))
    bumped = verts.at[4, 2].set(0.5)
    loss_bump = float(M.laplacian_smoothing_loss(bumped, nbr, mask))
    assert loss_bump > loss_flat


def test_chamfer_identity_and_offset():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32))
    assert float(chamfer_distance(x, x)) < 1e-9
    y = x + 0.5
    d = float(chamfer_distance(x, y))
    assert d > 0.01
