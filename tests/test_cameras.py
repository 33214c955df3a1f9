import numpy as np
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import cameras as C


def make_lookat_extrinsic(eye, target=np.zeros(3), up=np.array([0, 1.0, 0])):
    """OpenCV-style world->camera matrix looking at target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    R = np.stack([right, dn, fwd], axis=0)  # rows
    t = -R @ eye
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = t
    return E


def test_camera_center_inverts_extrinsic():
    eye = np.array([0.3, -0.2, 2.5], np.float32)
    E = make_lookat_extrinsic(eye)
    c = np.asarray(C.camera_center(jnp.asarray(E)))
    np.testing.assert_allclose(c, eye, atol=1e-5)


def test_projection_center_point():
    """A point on the optical axis must project to the principal point."""
    W = H = 64
    K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    cam = C.make_camera(jnp.asarray(K), jnp.asarray(E), W, H)
    full = cam.view.T @ cam.proj.T  # row-vector form: x_ndc = x_world @ view^T @ proj^T
    # Equivalent column form:
    full_col = np.asarray(cam.proj) @ np.asarray(cam.view)
    p = np.array([0.0, 0.0, 2.0, 1.0])
    ndc = full_col @ p
    ndc = ndc / ndc[3]
    # principal point at exact center -> NDC 0 (pixel 32 of 64 with the
    # reference's (2*px - w)/w offset convention)
    np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-6)


def test_projection_matches_pixel_projection():
    """NDC projection and plain K-projection must agree: ndc = (2*pix - size)/size."""
    W, H = 128, 96
    K = np.array([[150.0, 0, 70.0], [0, 140.0, 40.0], [0, 0, 1]], np.float32)
    E = make_lookat_extrinsic(np.array([0.5, 0.1, 3.0]))
    pts = np.random.RandomState(0).randn(20, 3).astype(np.float32) * 0.3

    cam = C.make_camera(jnp.asarray(K), jnp.asarray(E), W, H)
    full_col = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))
    ndc = np.asarray(C.project_points(full_col, jnp.asarray(pts)))

    pix = np.asarray(C.project_xyz(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(E)))
    expect_x = (2 * pix[:, 0] - W) / W
    expect_y = (2 * pix[:, 1] - H) / H
    np.testing.assert_allclose(ndc[:, 0], expect_x, atol=1e-4)
    np.testing.assert_allclose(ndc[:, 1], expect_y, atol=1e-4)


def test_focal_fov_roundtrip():
    f = jnp.asarray(1200.0)
    fov = C.focal2fov(f, 1024)
    f2 = C.fov2focal(fov, 1024)
    np.testing.assert_allclose(float(f2), 1200.0, rtol=1e-6)


def test_depth_in_w():
    """The reference projection stores camera depth in the w coordinate."""
    K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]], np.float32)
    P = np.asarray(C.projection_ndc(jnp.asarray(K), 64, 64))
    p = np.array([0.3, -0.1, 5.0, 1.0])
    clip = P @ p
    np.testing.assert_allclose(clip[3], 5.0, atol=1e-6)
