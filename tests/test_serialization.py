import numpy as np
import jax.numpy as jnp
import pytest

from audio_motion_avatar_tpu.ops import serialization as ser


def full_grid(depth):
    n = 1 << depth
    g = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij"), axis=-1).reshape(-1, 3)
    return jnp.asarray(g.astype(np.int32))


@pytest.mark.parametrize("order", ["z", "hilbert"])
def test_bijective_on_small_grid(order):
    depth = 3
    g = full_grid(depth)
    codes = np.asarray(ser.encode(g, order, depth=depth))
    assert len(np.unique(codes)) == g.shape[0]
    assert codes.min() == 0 and codes.max() == g.shape[0] - 1


def test_z_order_known_values():
    g = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
                    jnp.int32)
    codes = np.asarray(ser.z_encode(g))
    np.testing.assert_array_equal(codes, [0, 1, 2, 4, 7])


def test_hilbert_locality_beats_random():
    """Consecutive Hilbert codes must correspond to adjacent cells
    (step distance exactly 1 on the full curve)."""
    depth = 3
    g = np.asarray(full_grid(depth))
    codes = np.asarray(ser.encode(jnp.asarray(g), "hilbert", depth=depth))
    order = np.argsort(codes)
    path = g[order]
    d = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert d.max() == 1, f"hilbert curve must move one cell at a time, got {d.max()}"


def test_trans_variants_permute_axes():
    g = jnp.asarray([[1, 2, 3]], jnp.int32)
    a = np.asarray(ser.encode(g, "z"))
    b = np.asarray(ser.encode(g, "z-trans"))
    c = np.asarray(ser.encode(jnp.asarray([[2, 3, 1]], jnp.int32), "z"))
    assert b[0] == c[0]
    assert a[0] != b[0]


def test_grid_coords_nonnegative_and_clipped():
    pts = jnp.asarray([[-1.4, 0.0, 1.4], [0.5, -0.2, 0.3]])
    g = np.asarray(ser.grid_coords(pts, 100.0))
    assert g.min() >= 0
    assert g.max() < 1024
