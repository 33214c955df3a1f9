import numpy as np

from audio_motion_avatar_tpu.utils.graphics import (draw_smplx_on_image,
                                                    rasterize_mesh_overlay,
                                                    visualize_triplane_pca)
from audio_motion_avatar_tpu.utils.profiling import StageTimer, timed


def test_mesh_overlay_draws_pixels():
    img = np.zeros((64, 64, 3), np.float32)
    # one big triangle in front of the camera
    verts = np.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    K = np.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[2, 3] = 2.0
    out = rasterize_mesh_overlay(img, verts, faces, K, E)
    assert out.shape == img.shape
    assert out.sum() > 0          # something was drawn
    assert (out[0, 0] == 0).all()  # corners untouched


def test_overlay_respects_depth():
    """A triangle behind the camera must not draw."""
    img = np.zeros((32, 32, 3), np.float32)
    verts = np.asarray([[-0.5, -0.5, -5.0], [0.5, -0.5, -5.0], [0.0, 0.5, -5.0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    K = np.asarray([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[2, 3] = 2.0
    out = rasterize_mesh_overlay(img, verts, faces, K, E)
    assert out.sum() == 0


def test_draw_smplx_with_transl():
    img = np.zeros((32, 32, 3), np.float32)
    verts = np.asarray([[-0.3, -0.3, 0], [0.3, -0.3, 0], [0, 0.4, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    K = np.asarray([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[2, 3] = 2.0
    out = draw_smplx_on_image(img, verts, faces, K, E, transl=[0, 0, 0.5])
    assert out.sum() > 0


def test_triplane_pca():
    planes = np.random.RandomState(0).randn(3, 8, 16, 16).astype(np.float32)
    img = visualize_triplane_pca(planes)
    assert img.shape == (16, 48, 3)
    assert img.min() >= 0 and img.max() <= 1


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a=" in t.summary()


def test_timed():
    import jax.numpy as jnp
    dt, out = timed(lambda x: x * 2, jnp.ones(4), iters=2)
    assert dt >= 0
    assert float(out.sum()) == 8.0


def test_polyphase_upsample_conv_exact():
    """_upsample2x_conv3x3 must equal conv3x3(SAME) on nearest2x input."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import (_nearest2x,
                                                          _upsample2x_conv3x3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 5, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))

    fused = _upsample2x_conv3x3(x, w, b)

    up = _nearest2x(x)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
