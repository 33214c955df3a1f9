import pytest
import numpy as np
import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import smplx as S
from audio_motion_avatar_tpu.ops import subdivision as sub


MODEL = S.synthetic_model(seed=0, num_verts=400)


def test_rest_pose_matches_template():
    params = S.default_params((1,))
    verts = S.forward(MODEL, params)
    assert verts.shape == (1, 400, 3)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(MODEL.v_template), atol=1e-5)


def test_betas_move_verts():
    params = S.default_params((1,))
    params["betas"] = params["betas"].at[0, 0].set(2.0)
    verts = S.forward(MODEL, params)
    expected = np.asarray(MODEL.v_template) + 2.0 * np.asarray(MODEL.shapedirs)[..., 0]
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=1e-5)


def test_global_orient_rotates_about_root():
    """Rotating only the root joint must rigidly rotate the whole body about
    the root joint location (pose blend shapes are not triggered by the root)."""
    params = S.default_params((1,))
    aa = np.array([0.0, np.pi / 2, 0.0], np.float32)
    params["global_orient"] = jnp.asarray(aa)[None]
    verts = np.asarray(S.forward(MODEL, params))[0]

    rest = np.asarray(MODEL.v_template)
    root = np.asarray(MODEL.J_regressor)[0] @ rest  # root joint position
    c, s = 0.0, 1.0  # cos/sin of 90deg
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    expected = (rest - root) @ R.T + root
    np.testing.assert_allclose(verts, expected, atol=1e-4)


def test_transl():
    params = S.default_params((1,))
    params["transl"] = jnp.asarray([[1.0, 2.0, 3.0]])
    v0 = np.asarray(S.forward(MODEL, params, apply_transl=False))
    v1 = np.asarray(S.forward(MODEL, params, apply_transl=True))
    np.testing.assert_allclose(v1 - v0, np.broadcast_to([1.0, 2.0, 3.0], v0.shape), atol=1e-6)


def test_flat_hand_mean():
    model = MODEL._replace(left_hand_mean=jnp.full((45,), 0.1),
                           right_hand_mean=jnp.full((45,), -0.1))
    params = S.default_params((1,))
    v_flat = np.asarray(S.forward(model, params, flat_hand_mean=True))
    v_mean = np.asarray(S.forward(model, params, flat_hand_mean=False))
    assert np.abs(v_flat - v_mean).max() > 1e-6


def test_batched_and_jit():
    params = S.default_params((4,))
    key = jax.random.PRNGKey(0)
    params["body_pose"] = 0.3 * jax.random.normal(key, (4, 63))
    f = jax.jit(lambda p: S.forward(MODEL, p))
    verts = f(params)
    assert verts.shape == (4, 400, 3)
    assert np.isfinite(np.asarray(verts)).all()
    # different poses -> different verts
    assert np.abs(np.asarray(verts[0]) - np.asarray(verts[1])).max() > 1e-4


@pytest.mark.slow
def test_grad_flows():
    params = S.default_params((1,))

    def loss(p):
        return (S.forward(MODEL, p) ** 2).sum()

    g = jax.grad(lambda bp: loss({**params, "body_pose": bp}))(params["body_pose"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


# --- subdivision ---

def test_face_center_densify():
    verts = MODEL.v_template[None]
    faces = np.asarray(MODEL.faces)
    out = sub.face_center_densify(verts, faces)
    assert out.shape == (1, 400 + faces.shape[0], 3)
    c0 = np.asarray(verts[0])[faces[0]].mean(0)
    np.testing.assert_allclose(np.asarray(out[0, 400]), c0, atol=1e-6)


def test_midpoint_subdivision():
    # tetrahedron
    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    tables = sub.build_subdivision(4, faces, steps=1)
    out = sub.apply_subdivision(verts[None], tables)
    # 4 faces, 6 unique edges -> 10 verts; 16 faces
    assert out.shape == (1, 10, 3)
    assert tables.faces[0].shape == (16, 3)
    # each new vert is a midpoint of a unique edge
    edges = tables.edges[0]
    mids = 0.5 * (np.asarray(verts)[edges[:, 0]] + np.asarray(verts)[edges[:, 1]])
    np.testing.assert_allclose(np.asarray(out[0, 4:]), mids, atol=1e-6)


def test_two_step_subdivision_counts():
    faces = np.asarray([[0, 1, 2]], np.int32)
    tables = sub.build_subdivision(3, faces, steps=2)
    # step1: 3 verts + 3 edges = 6 verts, 4 faces
    # step2: 6 verts + 9 edges = 15 verts, 16 faces
    assert tables.num_verts == (6, 15)
    assert tables.faces[1].shape == (16, 3)
    verts = jnp.asarray(np.random.RandomState(0).randn(3, 3).astype(np.float32))
    out = sub.apply_subdivision(verts[None], tables)
    assert out.shape == (1, 15, 3)


def test_fixed_subselect():
    idx = sub.fixed_subselect(100, 30, seed=1)
    assert idx.shape == (30,)
    assert len(np.unique(idx)) == 30
    assert idx.max() < 100
