"""Pallas tile-compositing kernel vs the XLA tile renderer.

On CPU the Pallas path runs via the XLA twin (`interpret=True` plumbing);
the kernel itself is additionally exercised through pallas interpret mode.
Real-TPU execution is covered by bench.py / the verify drive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops import splat, splat_pallas
from audio_motion_avatar_tpu.ops.cameras import make_camera


def make_proj(n=80, seed=0, w=64, h=64):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray((rng.randn(n, 3) * 0.4).astype(np.float32))
    rot = rng.randn(n, 4).astype(np.float32)
    rot[:, 0] += 3.0
    K = jnp.asarray([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1.0]])
    E = jnp.eye(4).at[2, 3].set(2.0)
    cam = make_camera(K, E, w, h)
    return splat.project_gaussians(
        xyz, jnp.asarray(rot),
        splat.activate_scales(jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3 + 1.0)),
        splat.activate_opacity(jnp.asarray(rng.randn(n).astype(np.float32) * 2)),
        jnp.asarray(rng.rand(n, 3).astype(np.float32)), cam)


def test_xla_twin_matches_render_tiles():
    proj = make_proj()
    a = np.asarray(splat_pallas.render_tiles_pallas(proj, 64, 64, max_per_tile=64,
                                                    interpret=True))
    b = np.asarray(splat.render_tiles(proj, 64, 64, max_per_tile=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode and compare."""
    proj = make_proj(n=40, seed=2)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(splat_pallas.render_tiles_pallas(proj, 64, 64, max_per_tile=64))
    b = np.asarray(splat.render_tiles(proj, 64, 64, max_per_tile=64))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_backward_matches_xla_renderer_grads():
    """Grads of the pallas-path renderer (custom VJP via the XLA twin) must
    match autodiff through splat.render_tiles."""
    proj = make_proj(n=32, seed=3)

    def loss_pallas(opacity):
        p = proj._replace(opacity=opacity)
        img = splat_pallas.render_tiles_pallas(p, 64, 64, max_per_tile=32,
                                               interpret=True)
        return ((img - 0.2) ** 2).mean()

    def loss_xla(opacity):
        p = proj._replace(opacity=opacity)
        img = splat.render_tiles(p, 64, 64, max_per_tile=32)
        return ((img - 0.2) ** 2).mean()

    g1 = np.asarray(jax.grad(loss_pallas)(proj.opacity))
    g2 = np.asarray(jax.grad(loss_xla)(proj.opacity))
    np.testing.assert_allclose(g1, g2, atol=1e-5)
    assert np.abs(g1).max() > 0


def test_bwd_kernel_matches_xla_vjp():
    """The hand-written Pallas backward kernel must equal autodiff through
    the XLA twin on the packed-params level (all 9 channels)."""
    from jax.experimental.pallas import tpu as pltpu

    proj = make_proj(n=48, seed=4)
    order, tile_idx, tile_mask = splat.bin_gaussians_sorted(proj, 64, 64, 48)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opac = jnp.where(proj.valid[order], proj.opacity[order], 0.0)
    packed = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
         opac, color[:, 0], color[:, 1], color[:, 2]], axis=0)
    tile_params = jnp.swapaxes(jnp.take(packed, tile_idx, axis=1), 0, 1)
    tile_params = tile_params.at[:, 5, :].multiply(
        tile_mask.astype(tile_params.dtype))

    tx = 4
    tids = jnp.arange(16)
    tile_origin = jnp.stack(
        [(tids % tx * 16).astype(jnp.float32),
         (tids // tx * 16).astype(jnp.float32)], axis=-1)

    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(16, 256, 3).astype(np.float32))

    dp_ref = np.asarray(
        splat_pallas._composite_tiles_bwd_xla(tile_params, tile_origin, g))
    with pltpu.force_tpu_interpret_mode():
        dp_ker = np.asarray(
            splat_pallas._composite_tiles_bwd_pallas(tile_params, g, tx))
    np.testing.assert_allclose(dp_ker, dp_ref, rtol=1e-4, atol=1e-5)
    assert np.abs(dp_ker).max() > 0


def test_full_grad_path_through_pallas_vjp():
    """End-to-end: grads of render_tiles_pallas (fwd+bwd kernels, interpret
    mode) vs autodiff through splat.render_tiles, through projection down to
    raw gaussian params."""
    from jax.experimental.pallas import tpu as pltpu

    proj = make_proj(n=32, seed=5)

    def loss_pallas(opacity, mean2d, color):
        p = proj._replace(opacity=opacity, mean2d=mean2d, color=color)
        img = splat_pallas.render_tiles_pallas(p, 64, 64, max_per_tile=32)
        return ((img - 0.2) ** 2).mean()

    def loss_xla(opacity, mean2d, color):
        p = proj._replace(opacity=opacity, mean2d=mean2d, color=color)
        img = splat.render_tiles(p, 64, 64, max_per_tile=32)
        return ((img - 0.2) ** 2).mean()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(
            proj.opacity, proj.mean2d, proj.color)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(
        proj.opacity, proj.mean2d, proj.color)
    for a, b, name in zip(g1, g2, ["opacity", "mean2d", "color"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
        assert np.abs(np.asarray(a)).max() > 0, name


def test_render_frames_pallas_matches_render_one():
    """The batched-frames path (vmapped binning + per-frame composite) must
    equal F independent render_one calls (interpret mode -> XLA twin)."""
    import jax.numpy as jnp
    import numpy as np
    from audio_motion_avatar_tpu.ops import splat, splat_pallas

    rng = np.random.RandomState(5)
    F, N, W, H = 3, 60, 64, 64
    xyz = jnp.asarray((rng.randn(F, N, 3) * 0.4).astype(np.float32))
    rot = rng.randn(F, N, 4).astype(np.float32)
    rot[..., 0] += 3.0
    rot = jnp.asarray(rot)
    s = jnp.asarray(rng.randn(F, N, 3).astype(np.float32) * 0.3)
    o = jnp.asarray(rng.randn(F, N).astype(np.float32))
    c = jnp.asarray(rng.rand(F, N, 3).astype(np.float32))
    Ks, Es = [], []
    for f in range(F):
        Ks.append([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
        E = np.eye(4, dtype=np.float32)
        E[2, 3] = 2.0 + 0.2 * f
        Es.append(E)
    K = jnp.asarray(np.asarray(Ks, np.float32))
    E = jnp.asarray(np.stack(Es))

    batched = np.asarray(splat_pallas.render_frames_pallas(
        xyz, rot, s, o, c, K, E, W, H, max_per_tile=64, max_window=4,
        interpret=True))
    for f in range(F):
        one = np.asarray(splat.render_one(
            xyz[f], rot[f], s[f], o[f], c[f], K[f], E[f], W, H,
            max_per_tile=64, mode="tiles", max_window=4))
        np.testing.assert_allclose(batched[f], one, atol=2e-5)

    # The single-grid multi-frame KERNEL (tile origins repeat every
    # tiles-per-frame programs via the ntpf scalar) — pallas interpret mode,
    # both binning modes (vmapped batched sort / F serial sorts).
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        for bb in (True, False):
            multi = np.asarray(splat_pallas.render_frames_pallas(
                xyz, rot, s, o, c, K, E, W, H, max_per_tile=64,
                max_window=4, batched_binning=bb))
            np.testing.assert_allclose(multi, batched, atol=2e-5,
                                       err_msg=f"batched_binning={bb}")

    # Serving fast path: value-carrying-sort binning + segment-DMA
    # composite must reproduce the gather-packed result exactly.
    with pltpu.force_tpu_interpret_mode():
        seg = np.asarray(splat_pallas.render_frames_segmented(
            xyz, rot, s, o, c, K, E, W, H, max_per_tile=64, max_window=4))
    np.testing.assert_allclose(seg, batched, atol=2e-5)


def test_two_tier_binning_matches_single_tier():
    """Two-tier binning (generous large cap) must produce IDENTICAL per-tile
    segments to the single-tier max_window sort: every gaussian spanning
    more than 2 tiles rides the large list at full window, the rest emit
    2x2 blocks; merged (tile, depth-rank) keys sort to the same segments."""
    proj = make_proj(n=200, seed=3)
    w = h = 64
    kcap = 64
    p1, s1, c1 = splat_pallas._pack_sorted_params(proj, w, h, kcap,
                                                  max_window=4)
    p2, s2, c2 = splat_pallas._pack_sorted_params(proj, w, h, kcap,
                                                  max_window=4,
                                                  large_cap=128)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    c1n = np.asarray(c1)
    for t in range(s1.shape[0]):
        a = np.asarray(p1[:9, int(s1[t]):int(s1[t]) + c1n[t]])
        b = np.asarray(p2[:9, int(s2[t]):int(s2[t]) + c1n[t]])
        np.testing.assert_array_equal(a, b)


def test_two_tier_binning_overflow_degrades_gracefully():
    """With a too-small large cap, overflow gaussians fall back to 2x2
    clipping: per-tile segments are SUBSETS of the single-tier ones (never
    extra or reordered entries), counts never larger."""
    proj = make_proj(n=200, seed=4)
    w = h = 64
    kcap = 200   # uncapped: K-truncation would break the subset property
    p1, s1, c1 = splat_pallas._pack_sorted_params(proj, w, h, kcap,
                                                  max_window=4)
    p2, s2, c2 = splat_pallas._pack_sorted_params(proj, w, h, kcap,
                                                  max_window=4, large_cap=2)
    c1n, c2n = np.asarray(c1), np.asarray(c2)
    assert (c2n <= c1n).all()
    for t in range(s1.shape[0]):
        a = np.asarray(p1[0, int(s1[t]):int(s1[t]) + c1n[t]])   # mx row
        b = np.asarray(p2[0, int(s2[t]):int(s2[t]) + c2n[t]])
        # subset in order: every two-tier entry appears in the single-tier
        # segment, in the same relative (depth) order
        ai = 0
        for x in b:
            while ai < len(a) and a[ai] != x:
                ai += 1
            assert ai < len(a), "two-tier emitted an entry single-tier lacks"
            ai += 1
