import numpy as np
import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import splat
from audio_motion_avatar_tpu.ops.cameras import make_camera


def scene(n=64, seed=0, spread=0.4):
    rng = np.random.RandomState(seed)
    xyz = (rng.randn(n, 3) * spread).astype(np.float32)
    rot = rng.randn(n, 4).astype(np.float32)
    rot[:, 0] += 3.0  # near-identity quats
    raw_scales = rng.randn(n, 3).astype(np.float32) * 0.3  # exp(s-3.9) ~ 0.02
    raw_opacity = rng.randn(n).astype(np.float32) * 2.0
    colors = rng.rand(n, 3).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(rot), jnp.asarray(raw_scales),
            jnp.asarray(raw_opacity), jnp.asarray(colors))


def front_camera(width=64, height=64, focal=80.0, dist=2.0):
    K = jnp.asarray([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1.0]])
    E = jnp.eye(4).at[2, 3].set(dist)  # camera at z=-dist looking +z
    return K, E


def test_empty_scene_is_background():
    xyz, rot, s, o, c = scene(8)
    o = o - 100.0  # opacity ~ 0
    K, E = front_camera()
    img = np.asarray(splat.render_one(xyz, rot, s, o, c, K, E, 64, 64))
    np.testing.assert_allclose(img, 1.0, atol=1e-4)


def test_single_gaussian_center_analytic():
    """One Gaussian dead-center: the center pixel blends alpha*color with bg."""
    xyz = jnp.asarray([[0.0, 0.0, 0.0]])
    rot = jnp.asarray([[1.0, 0, 0, 0]])
    raw_s = jnp.zeros((1, 3))          # scale = exp(-3.9) ~ 0.0202
    raw_o = jnp.asarray([0.0])         # opacity = 0.5
    color = jnp.asarray([[1.0, 0.0, 0.0]])
    K, E = front_camera(64, 64, focal=80.0, dist=2.0)
    img = np.asarray(splat.render_one(xyz, rot, raw_s, raw_o, color, K, E, 64, 64,
                                      mode="naive"))
    # mean projects to (31.5, 31.5); nearest pixel centers are 0.5px away in
    # both axes. screen sigma^2 = (scale*f/z)^2 + 0.3 dilation.
    cy, cx = np.unravel_index(np.argmin(img[..., 1]), img[..., 1].shape)
    assert abs(cy - 31.5) < 2 and abs(cx - 31.5) < 2
    sigma2 = (np.exp(-3.9) * 80.0 / 2.0) ** 2 + 0.3
    alpha = 0.5 * np.exp(-0.5 * (0.5 ** 2 + 0.5 ** 2) / sigma2)
    expect_r = alpha * 1.0 + (1 - alpha) * 1.0  # blend with white bg
    expect_g = (1 - alpha) * 1.0
    assert abs(img[cy, cx, 0] - expect_r) < 0.01, (img[cy, cx], expect_r)
    assert abs(img[cy, cx, 1] - expect_g) < 0.01, (img[cy, cx], expect_g)


def test_occlusion_order():
    """Front red must occlude back blue regardless of input order."""
    xyz = jnp.asarray([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]])  # blue nearer? z+dist: depth 2.5 vs 1.5
    rot = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    raw_s = jnp.full((2, 3), 2.0)      # bigger blobs
    raw_o = jnp.full((2,), 8.0)        # opacity ~ 1 -> alpha capped at 0.99
    color = jnp.asarray([[1.0, 0, 0], [0, 0, 1.0]])  # red at z=0.5 (farther), blue at -0.5 (nearer)
    K, E = front_camera(64, 64)
    img = np.asarray(splat.render_one(xyz, rot, raw_s, raw_o, color, K, E, 64, 64,
                                      mode="naive"))
    c = img[32, 32]
    assert c[2] > 0.9 and c[0] < 0.1, c  # blue wins (nearer to camera)


def test_tiles_match_naive():
    xyz, rot, s, o, c = scene(96, seed=3)
    K, E = front_camera(64, 64)
    img_t = np.asarray(splat.render_one(xyz, rot, s, o, c, K, E, 64, 64, mode="tiles"))
    img_n = np.asarray(splat.render_one(xyz, rot, s, o, c, K, E, 64, 64, mode="naive"))
    np.testing.assert_allclose(img_t, img_n, atol=1e-4)


def test_tiles_match_naive_bigger_gaussians():
    xyz, rot, s, o, c = scene(64, seed=4)
    s = s + 2.5  # large radii -> many tiles per gaussian
    K, E = front_camera(64, 64)
    img_t = np.asarray(splat.render_one(xyz, rot, s, o, c, K, E, 64, 64, mode="tiles"))
    img_n = np.asarray(splat.render_one(xyz, rot, s, o, c, K, E, 64, 64, mode="naive"))
    # Tile binning truncates at the 3-sigma bbox (as the CUDA rasterizer
    # does); the naive oracle composites tails beyond it, so allow the tiny
    # truncation residual for near-opaque gaussians (alpha floor kicks in at
    # ~3.33 sigma for opacity 1).
    np.testing.assert_allclose(img_t, img_n, atol=3e-3)
    assert np.abs(img_t - img_n).mean() < 1e-5


def test_behind_camera_culled():
    xyz = jnp.asarray([[0.0, 0.0, -5.0]])  # behind camera (depth = -3)
    rot = jnp.asarray([[1.0, 0, 0, 0]])
    K, E = front_camera()
    img = np.asarray(splat.render_one(xyz, rot, jnp.full((1, 3), 3.0),
                                      jnp.asarray([10.0]), jnp.asarray([[1.0, 0, 0]]),
                                      K, E, 64, 64))
    np.testing.assert_allclose(img, 1.0, atol=1e-4)


def test_gradients_flow():
    xyz, rot, s, o, c = scene(32, seed=5)
    K, E = front_camera(32, 32)

    def loss(xyz, s, o, c):
        img = splat.render_one(xyz, rot, s, o, c, K, E, 32, 32)
        return ((img - 0.3) ** 2).mean()

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(xyz, s, o, c)
    for gi, name in zip(g, ["xyz", "scale", "opacity", "color"]):
        arr = np.asarray(gi)
        assert np.isfinite(arr).all(), name
        assert np.abs(arr).max() > 0, name


def test_render_multi_view_shapes():
    xyz, rot, s, o, c = scene(16)
    gaussians = {
        "xyz": xyz[None], "rot": rot[None], "scale": s[None],
        "opacity": o[None, :, None], "color": c[None],
    }
    K, E = front_camera(32, 32)
    Ks = jnp.tile(K[None, None], (1, 3, 1, 1))
    Es = jnp.tile(E[None, None], (1, 3, 1, 1))
    out = splat.render_multi_view(gaussians, Ks, Es, 32, 32)
    assert out.shape == (1, 3, 32, 32, 3)
    # same camera -> identical frames
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[0, 2]), atol=1e-6)


def test_projection_depth_and_validity():
    xyz = jnp.asarray([[0.0, 0, 0], [0, 0, -1.9]])  # depths 2.0, 0.1 (< NEAR_CULL)
    K, E = front_camera()
    cam = make_camera(K, E, 64, 64)
    proj = splat.project_gaussians(
        xyz, jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
        jnp.full((2, 3), 0.02), jnp.full((2,), 0.5),
        jnp.zeros((2, 3)), cam)
    np.testing.assert_allclose(np.asarray(proj.depth), [2.0, 0.1], atol=1e-6)
    assert bool(proj.valid[0]) and not bool(proj.valid[1])


def test_sorted_binning_matches_topk_binning():
    """bin_gaussians_sorted must produce identical images to the original
    top_k binning (both = first-K depth-ordered overlapping gaussians)."""
    for seed, bump in [(7, 0.0), (8, 2.0)]:
        xyz, rot, s, o, c = scene(96, seed=seed)
        s = s + bump
        K, E = front_camera(64, 64)
        from audio_motion_avatar_tpu.ops.cameras import make_camera
        cam = make_camera(K, E, 64, 64)
        proj = splat.project_gaussians(
            xyz, rot, splat.activate_scales(s), splat.activate_opacity(o),
            jnp.clip(c, 0, 1), cam)
        img_a = np.asarray(splat.render_tiles(proj, 64, 64, max_per_tile=96,
                                              binner="sorted"))
        img_b = np.asarray(splat.render_tiles(proj, 64, 64, max_per_tile=96,
                                              binner="topk"))
        np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_sorted_binning_window_truncation():
    """A gaussian whose bbox exceeds the 8x8-tile window is truncated in
    sorted binning (documented deviation); full binning covers all tiles."""
    xyz = jnp.asarray([[0.0, 0.0, 0.0]])
    rot = jnp.asarray([[1.0, 0, 0, 0]])
    s = jnp.full((1, 3), 5.5)  # clamped scale 0.1 world
    o = jnp.asarray([2.0])
    c = jnp.asarray([[1.0, 0.0, 0.0]])
    # focal 1000 at dist 2 -> sigma ~50px, radius ~150px on a 256px image
    K, E = front_camera(256, 256, focal=1000.0)
    from audio_motion_avatar_tpu.ops.cameras import make_camera
    cam = make_camera(K, E, 256, 256)
    proj = splat.project_gaussians(
        xyz, rot, splat.activate_scales(s), splat.activate_opacity(o), c, cam)
    order, idx, mask = splat.bin_gaussians_sorted(proj, 256, 256, 4,
                                                  max_window=8)
    order2, idx2, mask2 = splat.bin_gaussians(proj, 256, 256, 4)
    assert int(mask.sum()) == 64        # truncated to the 8x8 window
    assert int(mask2.sum()) > 64        # full binning covers more tiles


def test_sorted_binning_reference_resolutions():
    """The binner must handle the reference's real training resolutions —
    THuman 1024x1024 (4096 tiles, thuman.yaml:13) and IDOL 896x640 (2240
    tiles, idol.yaml:22) — formerly rejected by the int32 tile_id<<20 key.
    Parity vs the dense top-k binner at each resolution."""
    for (W, H) in [(1024, 1024), (896, 640)]:
        xyz, rot, s, o, c = scene(128, seed=11, spread=0.6)
        K, E = front_camera(W, H, focal=5000.0 * W / 1024, dist=2.5)
        cam = make_camera(K, E, W, H)
        proj = splat.project_gaussians(
            xyz, rot, splat.activate_scales(s), splat.activate_opacity(o),
            jnp.clip(c, 0, 1), cam)
        # radius at focal 5000 spans up to ~20 tiles -> window must cover it
        o1, i1, m1 = splat.bin_gaussians_sorted(proj, W, H, 32, max_window=32)
        o2, i2, m2 = splat.bin_gaussians(proj, W, H, 32)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(i1)[np.asarray(m1)],
                                      np.asarray(i2)[np.asarray(m2)])


def test_sorted_binning_packed_vs_lexsort():
    """The packed single-key path and the two-key lax.sort fallback must be
    exactly equivalent (the fallback covers tile*gaussian counts past int32
    packing)."""
    xyz, rot, s, o, c = scene(96, seed=12, spread=0.6)
    W, H = 896, 640
    K, E = front_camera(W, H, focal=3000.0, dist=2.5)
    cam = make_camera(K, E, W, H)
    proj = splat.project_gaussians(
        xyz, rot, splat.activate_scales(s), splat.activate_opacity(o),
        jnp.clip(c, 0, 1), cam)
    o1, i1, m1 = splat.bin_gaussians_sorted(proj, W, H, 16, key_mode="packed")
    o2, i2, m2 = splat.bin_gaussians_sorted(proj, W, H, 16, key_mode="lexsort")
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(m1)],
                                  np.asarray(i2)[np.asarray(m2)])


def test_render_tiles_reference_resolution_896x640():
    """Full sorted-path render at IDOL's 896x640 matches the top-k-binned
    render exactly (end-to-end through compositing)."""
    xyz, rot, s, o, c = scene(96, seed=13, spread=0.5)
    W, H = 896, 640
    K, E = front_camera(W, H, focal=2000.0, dist=2.5)
    cam = make_camera(K, E, W, H)
    proj = splat.project_gaussians(
        xyz, rot, splat.activate_scales(s), splat.activate_opacity(o),
        jnp.clip(c, 0, 1), cam)
    img_a = np.asarray(splat.render_tiles(proj, W, H, max_per_tile=96,
                                          binner="sorted", max_window=24))
    img_b = np.asarray(splat.render_tiles(proj, W, H, max_per_tile=96,
                                          binner="topk"))
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)
