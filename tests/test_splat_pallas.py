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
