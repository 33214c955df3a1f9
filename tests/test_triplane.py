import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from audio_motion_avatar_tpu.ops import triplane as T


def test_grid_sample_matches_torch():
    """Bit-compat check against F.grid_sample(align_corners=False, zeros)."""
    rng = np.random.RandomState(0)
    feat = rng.randn(5, 8, 9).astype(np.float32)  # C,H,W
    grid = (rng.rand(50, 2).astype(np.float32) * 2.4 - 1.2)  # includes out-of-range

    ours = np.asarray(T.grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))

    tfeat = torch.from_numpy(feat)[None]
    tgrid = torch.from_numpy(grid)[None, None]  # (1,1,N,2)
    ref = F.grid_sample(tfeat, tgrid, align_corners=False, mode="bilinear",
                        padding_mode="zeros")[0, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_triplane_matches_reference_composition():
    """sample_triplane == the reference's stacked grid_sample over 3 planes
    (renderer.py:292-317)."""
    rng = np.random.RandomState(1)
    B, C, R, N = 2, 4, 16, 37
    planes = rng.randn(B, 3, C, R, R).astype(np.float32)
    pts = (rng.rand(B, N, 3).astype(np.float32) * 2 - 1) * 1.4
    radius = 1.4

    ours = np.asarray(T.sample_triplane(jnp.asarray(planes), jnp.asarray(pts), radius))

    pos = np.clip(pts / radius, -1, 1)
    grids = np.stack([pos[..., [0, 1]], pos[..., [0, 2]], pos[..., [1, 2]]], axis=1)  # B,3,N,2
    tp = torch.from_numpy(planes.reshape(B * 3, C, R, R))
    tg = torch.from_numpy(grids.reshape(B * 3, 1, N, 2))
    ref = F.grid_sample(tp, tg, align_corners=False, mode="bilinear")
    ref = ref.reshape(B, 3, C, N).permute(0, 3, 1, 2).reshape(B, N, 3 * C).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_scatter_mean_plane():
    vals = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]])  # B=1,N=3,C=2
    idx = jnp.asarray([[0, 0, 5]])  # two points in cell 0, one in cell 5
    plane = np.asarray(T.scatter_mean_plane(vals, idx, resolution=4))
    assert plane.shape == (1, 2, 4, 4)
    # cell 0 -> row 0 col 0: mean of [1,2],[3,4] = [2,3]
    np.testing.assert_allclose(plane[0, :, 0, 0], [2.0, 3.0])
    # cell 5 = col 1 + 4*row 1
    np.testing.assert_allclose(plane[0, :, 1, 1], [5.0, 6.0])
    # empty cells zero
    assert plane[0, :, 3, 3].sum() == 0


def test_pool_local_max():
    # two points share the same cell on every plane -> both get elementwise max
    pts = jnp.asarray([[[0.01, 0.01, 0.01], [0.012, 0.012, 0.012], [1.0, 1.0, 1.0]]])
    idx3 = T.plane_cell_index(pts, radius=1.4, resolution=8)
    vals = jnp.asarray([[[1.0, 5.0], [2.0, 3.0], [9.0, 9.0]]])
    pooled = np.asarray(T.pool_local_max(vals, idx3, resolution=8))
    # points 0,1 pooled together on all 3 planes: max=[2,5] summed x3
    np.testing.assert_allclose(pooled[0, 0], [6.0, 15.0])
    np.testing.assert_allclose(pooled[0, 1], [6.0, 15.0])
    np.testing.assert_allclose(pooled[0, 2], [27.0, 27.0])


def test_plane_cell_index_consistent_with_sampling_axes():
    """Scatter a point's feature, then sample at the same point: the value
    must come back (up to bilinear spreading) — checks x/y (col/row) layout
    agreement between encoder scatter and renderer sampling."""
    R = 32
    radius = 1.4
    pt = np.asarray([[[0.7, -0.3, 0.2]]], np.float32)
    val = jnp.asarray([[[1.0]]])
    planes = T.build_triplanes(val, jnp.asarray(pt), radius, R)  # (1,3,1,R,R)
    sampled = np.asarray(T.sample_triplane(planes, jnp.asarray(pt), radius))
    # Each plane's bilinear read at the scatter location must be > 0.
    assert (sampled[0, 0] > 0.05).all(), sampled


def test_tokens_planes_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 7, 5, 3 * 4 * 4).astype(np.float32))  # B,T,C,S
    planes = T.tokens_to_planes(x, 4)
    assert planes.shape == (2, 7, 3, 5, 4, 4)
    back = T.planes_to_tokens(planes)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_sample_triplane_nhwc_matches_nchw():
    """The channel-last sampler (the renderer's layout) must agree with the
    NCHW reference path, including bf16-plane gathers within tolerance."""
    import jax.numpy as jnp
    import numpy as np
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(11)
    planes = rng.randn(2, 3, 16, 8, 8).astype(np.float32)  # (B,3,C,H,W)
    pts = (rng.rand(2, 40, 3) * 2 - 1).astype(np.float32) * 1.2
    radius = 1.4
    ref = np.asarray(T.sample_triplane(jnp.asarray(planes),
                                       jnp.asarray(pts), radius))
    nhwc = jnp.transpose(jnp.asarray(planes), (0, 1, 3, 4, 2))
    out = np.asarray(T.sample_triplane_nhwc(nhwc, jnp.asarray(pts), radius))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    out_bf16 = np.asarray(T.sample_triplane_nhwc(
        nhwc.astype(jnp.bfloat16), jnp.asarray(pts), radius))
    np.testing.assert_allclose(out_bf16, ref, atol=3e-2)
    assert out_bf16.dtype == np.float32


def _sparse_setup(num_blocks=2, C=32, R=8, B=1, cap=None, seed=0):
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    rng = np.random.RandomState(seed)
    planes = jnp.asarray(rng.randn(B, 3, C, R, R).astype(np.float32))
    res = R * 2 ** num_blocks
    grid = res // 16
    cap = cap if cap is not None else grid * grid
    dense = TriplaneUpsampler(C, num_blocks, channels_last=True)
    sparse = TriplaneUpsampler(C, num_blocks, sparse_final=True,
                               sparse_max_tiles=cap)
    v = dense.init(jax.random.PRNGKey(0), planes)
    return planes, dense, sparse, v, res, grid


@pytest.mark.slow
def test_sparse_upsampler_full_coverage_equals_dense():
    """With EVERY tile covered the sparse final level (incl. its GroupNorm
    statistics over covered-tile interiors) must reproduce the dense
    upsampler bit-for-bit (up to fp assoc)."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    planes, dense, sparse, v, res, grid = _sparse_setup()
    # points covering every tile of every plane: a dense grid in [-1,1]^3
    g = np.linspace(-0.97, 0.97, 24)
    pts3 = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
    pts = jnp.asarray(pts3[None].astype(np.float32)) * 1.4  # radius 1.4
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)

    out_d = dense.apply(v, planes)                      # (B,3,res,res,C)
    sp = sparse.apply(v, planes, points_uv=uv)
    assert bool(sp.valid.all()), "full grid must cover every tile"

    feats_d = T.sample_triplane_nhwc(out_d, pts, 1.4)
    feats_s = T.sample_triplane_sparse(sp, pts, 1.4)
    np.testing.assert_allclose(np.asarray(feats_s), np.asarray(feats_d),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_sparse_upsampler_partial_coverage_sane():
    """Body-like cluster: sampled features must be finite, nonzero, and the
    slot map must mark uncovered tiles -1."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    planes, dense, sparse, v, res, grid = _sparse_setup(R=16, cap=9)
    assert grid == 4                         # 16 tiles, cap 9
    rng = np.random.RandomState(3)
    pts = jnp.asarray((rng.randn(1, 200, 3) * 0.1).astype(np.float32))
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    sp = sparse.apply(v, planes, points_uv=uv)
    assert int((sp.slot >= 0).sum()) < sp.slot.size  # uncovered tiles exist
    feats = T.sample_triplane_sparse(sp, pts, 1.4)
    assert np.isfinite(np.asarray(feats)).all()
    assert float(jnp.abs(feats).max()) > 0


@pytest.mark.slow
def test_sparse_upsampler_gradients_finite():
    """Training must work through the sparse path: grads w.r.t. params and
    input planes are finite (gathers/top_k select, grads flow via values)."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    planes, dense, sparse, v, res, grid = _sparse_setup(R=16, cap=9)
    rng = np.random.RandomState(4)
    pts = jnp.asarray((rng.randn(1, 64, 3) * 0.2).astype(np.float32))
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)

    def loss(params, pl):
        sp = sparse.apply(params, pl, points_uv=uv)
        f = T.sample_triplane_sparse(sp, pts, 1.4)
        return (f ** 2).mean()

    g_params, g_planes = jax.grad(loss, argnums=(0, 1))(v, planes)
    leaves = jax.tree_util.tree_leaves(g_params) + [g_planes]
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert float(jnp.abs(g_planes).max()) > 0


@pytest.mark.slow
def test_sparse_penultimate_full_coverage_equals_dense():
    """sparse_penultimate with every tile covered (both levels) must equal
    the dense upsampler: covered penultimate tiles are the exact dense
    recurrence scattered onto the skip background."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(7)
    C, R, nb = 32, 16, 2                      # 16 -> 32 (pen) -> 64 (final)
    planes = jnp.asarray(rng.randn(1, 3, C, R, R).astype(np.float32))
    dense = TriplaneUpsampler(C, nb, channels_last=True)
    sparse = TriplaneUpsampler(C, nb, sparse_final=True,
                               sparse_max_tiles=16,   # grid 4 -> all covered
                               sparse_penultimate=True,
                               sparse_pen_max_tiles=4)  # grid 2 -> all
    v = dense.init(jax.random.PRNGKey(0), planes)

    g = np.linspace(-0.97, 0.97, 24)
    pts3 = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
    pts = jnp.asarray(pts3[None].astype(np.float32)) * 1.4
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)

    out_d = dense.apply(v, planes)
    sp = sparse.apply(v, planes, points_uv=uv)
    assert bool(sp.valid.all())
    feats_d = T.sample_triplane_nhwc(out_d, pts, 1.4)
    feats_s = T.sample_triplane_sparse(sp, pts, 1.4)
    np.testing.assert_allclose(np.asarray(feats_s), np.asarray(feats_d),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_sparse_penultimate_partial_coverage_sane():
    """Cap-limited penultimate: finite, nonzero output; uncovered
    penultimate tiles degrade to the skip value (not garbage)."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(8)
    C, R, nb = 32, 16, 2
    planes = jnp.asarray(rng.randn(1, 3, C, R, R).astype(np.float32))
    sparse = TriplaneUpsampler(C, nb, sparse_final=True,
                               sparse_max_tiles=9,
                               sparse_penultimate=True,
                               sparse_pen_max_tiles=2)
    v = sparse.init(jax.random.PRNGKey(0), planes,
                    points_uv=jnp.zeros((1, 3, 8, 2)))
    pts = jnp.asarray((rng.randn(1, 200, 3) * 0.1).astype(np.float32))
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    sp = sparse.apply(v, planes, points_uv=uv)
    feats = T.sample_triplane_sparse(sp, pts, 1.4)
    assert np.isfinite(np.asarray(feats)).all()
    assert float(jnp.abs(feats).max()) > 0


@pytest.mark.slow
def test_slab_sampler_matches_taps():
    """The (2,2C)-slab sparse sampler (one gather per point/plane, haloed
    tiles) must match the 4-tap sampler: exactly under full coverage, and
    on every all-taps-covered point under partial coverage."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(11)
    grid, tile, C = 4, 8, 16
    res = grid * tile
    G2 = grid * grid
    pts = jnp.asarray((rng.rand(400, 2) * 2.4 - 1.2).astype(np.float32))

    # full coverage -> identical everywhere (incl. out-of-plane taps)
    tiles = jnp.asarray(rng.randn(G2, tile, tile, C).astype(np.float32))
    slot = jnp.arange(G2, dtype=np.int32)
    a = T.grid_sample_2d_sparse(tiles, slot, pts, grid, tile, res)
    b = T.grid_sample_2d_sparse_slab(T.tile_halo(tiles, slot, grid),
                                     slot, pts, grid, tile, res)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    # partial coverage -> identical on points whose taps are all covered
    keep = np.ones(G2, bool)
    keep[[3, 7, 9]] = False
    slot2 = np.full(G2, -1, np.int32)
    slot2[keep] = np.arange(int(keep.sum()))
    tiles2 = jnp.asarray(rng.randn(int(keep.sum()), tile, tile, C)
                         .astype(np.float32))
    a2 = T.grid_sample_2d_sparse(tiles2, slot2, pts, grid, tile, res)
    b2 = T.grid_sample_2d_sparse_slab(T.tile_halo(tiles2, slot2, grid),
                                      slot2, pts, grid, tile, res)
    x0 = np.floor((np.asarray(pts[:, 0]) + 1) * res / 2 - 0.5).astype(int)
    y0 = np.floor((np.asarray(pts[:, 1]) + 1) * res / 2 - 0.5).astype(int)

    def covered(xi, yi):
        inb = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
        t = (np.clip(yi, 0, res - 1) // tile) * grid + \
            (np.clip(xi, 0, res - 1) // tile)
        return ~inb | (slot2[t] >= 0)

    m = (covered(x0, y0) & covered(x0 + 1, y0)
         & covered(x0, y0 + 1) & covered(x0 + 1, y0 + 1))
    assert m.sum() > 100
    np.testing.assert_allclose(np.asarray(b2)[m], np.asarray(a2)[m],
                               atol=1e-6)


@pytest.mark.slow
def test_dilated_upconv_twin_matches_poly():
    """The 'dilated' upconv impl (input-dilated conv, derived 4x4 kernel)
    must equal the polyphase impl exactly — same params, dense AND sparse
    paths (it replaces the phase-interleave layout passes on TPU)."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import (
        TriplaneUpsampler, _upsample2x_conv3x3, _upsample2x_conv3x3_dilated)
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 9, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_upsample2x_conv3x3_dilated(x, w, b)),
        np.asarray(_upsample2x_conv3x3(x, w, b)), atol=2e-5)

    planes, dense, _, v, res, grid = _sparse_setup(seed=4)
    dil = TriplaneUpsampler(32, 2, channels_last=True, upconv="dilated")
    np.testing.assert_allclose(np.asarray(dil.apply(v, planes)),
                               np.asarray(dense.apply(v, planes)),
                               atol=3e-5, rtol=1e-4)

    # sparse path with partial coverage
    sp_poly = TriplaneUpsampler(32, 2, sparse_final=True, sparse_max_tiles=6)
    sp_dil = TriplaneUpsampler(32, 2, sparse_final=True, sparse_max_tiles=6,
                               upconv="dilated")
    pts = jnp.asarray((np.random.RandomState(5).rand(1, 50, 3) * 0.8 - 0.4)
                      .astype(np.float32))
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    a = sp_poly.apply(v, planes, points_uv=uv)
    d = sp_dil.apply(v, planes, points_uv=uv)
    np.testing.assert_allclose(np.asarray(d.tiles), np.asarray(a.tiles),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_quad_sampler_matches_taps():
    """The quad-row sparse sampler (ONE gather per point/plane) must match
    the 4-tap sampler: exactly under full coverage, and on every
    all-taps-covered point under partial coverage."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(12)
    grid, tile, C = 4, 8, 16
    res = grid * tile
    G2 = grid * grid
    pts = jnp.asarray((rng.rand(400, 2) * 2.4 - 1.2).astype(np.float32))

    tiles = jnp.asarray(rng.randn(G2, tile, tile, C).astype(np.float32))
    slot = jnp.arange(G2, dtype=np.int32)
    a = T.grid_sample_2d_sparse(tiles, slot, pts, grid, tile, res)
    sorted_ids = jnp.arange(G2, dtype=np.int32)   # full coverage, ascending
    b = T.grid_sample_2d_sparse_quad(T.quad_rows(tiles, slot, grid),
                                     sorted_ids, pts, grid, tile, res)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    keep = np.ones(G2, bool)
    keep[[2, 5, 13]] = False
    slot2 = np.full(G2, -1, np.int32)
    slot2[keep] = np.arange(int(keep.sum()))
    tiles2 = jnp.asarray(rng.randn(int(keep.sum()), tile, tile, C)
                         .astype(np.float32))
    a2 = T.grid_sample_2d_sparse(tiles2, slot2, pts, grid, tile, res)
    sorted_ids2 = jnp.asarray(np.nonzero(keep)[0].astype(np.int32))
    b2 = T.grid_sample_2d_sparse_quad(T.quad_rows(tiles2, slot2, grid),
                                      sorted_ids2, pts, grid, tile, res)
    x0 = np.floor((np.asarray(pts[:, 0]) + 1) * res / 2 - 0.5).astype(int)
    y0 = np.floor((np.asarray(pts[:, 1]) + 1) * res / 2 - 0.5).astype(int)

    def covered(xi, yi):
        inb = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
        t = (np.clip(yi, 0, res - 1) // tile) * grid + \
            (np.clip(xi, 0, res - 1) // tile)
        return ~inb | (slot2[t] >= 0)

    m = (covered(x0, y0) & covered(x0 + 1, y0)
         & covered(x0, y0 + 1) & covered(x0 + 1, y0 + 1))
    assert m.sum() > 100
    np.testing.assert_allclose(np.asarray(b2)[m], np.asarray(a2)[m],
                               atol=1e-6)


@pytest.mark.quick
def test_quad_rows_matches_halo_slices():
    """quad_rows builds the 4 tap fields DIRECTLY from tiles + neighbor
    edge strips (no tile_halo intermediate); it must be bit-identical to
    the halo+slice construction, on full and partial coverage."""
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops import triplane as T

    def via_halo(tiles, slot, grid):
        Tn = tiles.shape[1]
        th = T.tile_halo(tiles, slot, grid)
        return jnp.concatenate(
            [th[:, :Tn, :Tn], th[:, :Tn, 1:Tn + 1],
             th[:, 1:Tn + 1, :Tn], th[:, 1:Tn + 1, 1:Tn + 1]], axis=-1)

    rng = np.random.RandomState(21)
    grid, tile, C = 4, 8, 16
    G2 = grid * grid

    tiles = jnp.asarray(rng.randn(G2, tile, tile, C).astype(np.float32))
    slot = jnp.arange(G2, dtype=np.int32)
    np.testing.assert_array_equal(np.asarray(T.quad_rows(tiles, slot, grid)),
                                  np.asarray(via_halo(tiles, slot, grid)))

    keep = np.ones(G2, bool)
    keep[[0, 2, 5, 13, 15]] = False   # incl. grid corners/edges
    slot2 = np.full(G2, -1, np.int32)
    slot2[keep] = np.arange(int(keep.sum()))
    slot2 = jnp.asarray(slot2)
    tiles2 = jnp.asarray(rng.randn(int(keep.sum()), tile, tile, C)
                         .astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(T.quad_rows(tiles2, slot2, grid)),
        np.asarray(via_halo(tiles2, slot2, grid)))


@pytest.mark.slow
def test_quad_rows_pallas_matches_xla():
    """The Pallas quad builder (strip-routed one-pass copy kernel) must be
    bit-identical to quad_rows, full and partial coverage, incl. the
    batched build_quad dispatcher layout."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(22)
    grid, tile, C = 4, 8, 128   # C=128: one lane tile
    G2 = grid * grid

    # partial coverage with holes incl. corners/edges + slot-table padding
    keep = np.ones(G2, bool)
    keep[[0, 3, 6, 12, 15]] = False
    cap = int(keep.sum()) + 2   # 2 pad slots beyond coverage
    slot = np.full(G2, -1, np.int32)
    slot[keep] = np.arange(int(keep.sum()))
    tiles = rng.randn(2, cap, tile, tile, C).astype(np.float32)
    tiles[:, int(keep.sum()):] = 0.0                  # pad slots are zeros
    tiles = jnp.asarray(tiles, jnp.bfloat16)
    slots = jnp.asarray(np.stack([slot, slot]))

    want = jax.vmap(lambda t, s: T.quad_rows(t, s, grid))(tiles, slots)
    with pltpu.force_tpu_interpret_mode():
        got = T.quad_rows_pallas(tiles, slots, grid)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.slow
def test_sample_triplane_sparse_quad_full_pipeline():
    """sample_triplane_sparse_quad over a full-coverage SparseTriplanes
    equals sample_triplane_sparse (3 planes, batched)."""
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
    from audio_motion_avatar_tpu.ops import triplane as T

    rng = np.random.RandomState(13)
    C, R = 32, 16
    planes = jnp.asarray(rng.randn(1, 3, C, R, R).astype(np.float32))
    up = TriplaneUpsampler(C, 1, sparse_final=True, sparse_max_tiles=4,
                           sparse_tile_px=16)     # 32^2 out, grid 2, all
    pts = jnp.asarray((rng.randn(1, 300, 3) * 0.5).astype(np.float32))
    u = jnp.clip(pts / 1.4, -1, 1)
    uv = jnp.stack([jnp.stack([u[..., a0], u[..., a1]], -1)
                    for a0, a1 in T.PLANE_AXES], axis=1)
    v = up.init(jax.random.PRNGKey(0), planes, points_uv=uv)
    sp = up.apply(v, planes, points_uv=uv)
    assert bool(sp.valid.all())
    q = jax.vmap(jax.vmap(lambda t, s: T.quad_rows(t, s, sp.grid)))(
        sp.tiles, sp.slot)
    f_taps = T.sample_triplane_sparse(sp, pts, 1.4)
    f_quad = T.sample_triplane_sparse_quad(sp, q, pts, 1.4)
    np.testing.assert_allclose(np.asarray(f_quad), np.asarray(f_taps),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.quick
def test_select_tiles_histogram_matches_scatter():
    """The one-hot-reduce tile histogram inside select_tiles produces the
    same coverage/priority as a scatter-add histogram (the form it
    replaced; xprof: the scatter serialized at ~0 GiB/s)."""
    import jax.numpy as jn
    from audio_motion_avatar_tpu.models.upsampler import select_tiles

    rng = np.random.RandomState(7)
    grid, cap, tile_px = 8, 20, 16
    uv = jn.asarray(rng.uniform(-1, 1, size=(500, 2)).astype(np.float32))
    tile_ids, valid, slot, _sorted = select_tiles(uv, grid, cap, tile_px)

    # scatter-add oracle (identical math to the pre-optimization form)
    u = np.clip(np.asarray(uv), -1.0, 1.0)
    cell = np.floor((u + 1.0) * (grid / 2.0) - 0.5 / tile_px)
    cx = np.clip(cell[:, 0], 0, grid - 1).astype(np.int32)
    cy = np.clip(cell[:, 1], 0, grid - 1).astype(np.int32)
    tid = cy * grid + cx
    counts = np.zeros(grid * grid, np.float32)
    np.add.at(counts, tid, 1.0)
    # every covered tile (incl. 3x3 halo) must appear among valid tiles
    import scipy.ndimage as ndi
    dil = ndi.convolve(counts.reshape(grid, grid), np.ones((3, 3)),
                       mode="constant").reshape(-1)
    got = set(np.asarray(tile_ids)[np.asarray(valid)].tolist())
    want = set(np.nonzero(dil > 0)[0].tolist())
    if len(want) <= cap:
        assert got == want
    # slot is consistent
    sl = np.asarray(slot)
    for s, t in enumerate(np.asarray(tile_ids)[np.asarray(valid)]):
        assert sl[t] == s


@pytest.mark.quick
def test_slot_rank_matches_slot_gather():
    """slot_rank (compare-reduction lookup) == slot-table gather for every
    covered/uncovered tile id, including the all-invalid edge."""
    import jax
    from audio_motion_avatar_tpu.models.upsampler import select_tiles
    from audio_motion_avatar_tpu.ops.triplane import slot_rank

    rng = np.random.RandomState(11)
    grid, cap, tile_px = 8, 12, 8   # cap < typical coverage -> real holes
    uv = jnp.asarray(rng.uniform(-1, 1, size=(200, 2)).astype(np.float32))
    tile_ids, valid, slot, sorted_ids = select_tiles(uv, grid, cap, tile_px)
    tid = jnp.arange(grid * grid, dtype=jnp.int32)   # every tile id
    sl_rank, present = slot_rank(sorted_ids, tid)
    sl_gather = np.asarray(slot)[np.asarray(tid)]
    np.testing.assert_array_equal(np.asarray(present), sl_gather >= 0)
    m = sl_gather >= 0
    np.testing.assert_array_equal(np.asarray(sl_rank)[m], sl_gather[m])
    # slots are rank-ordered: tiles ascending <-> slots ascending
    ids = np.asarray(sorted_ids)
    v = ids < grid * grid
    assert (np.diff(ids[v]) > 0).all() if v.sum() > 1 else True
