"""Triplane scatter-pooling and bilinear sampling, pure JAX.

TPU-native replacement for the torch_scatter + F.grid_sample hot paths:
  * scatter_max local pooling + scatter_mean plane generation
    (reference: src/models/triplane_net.py:226-244) -> jax segment ops
    (XLA scatter, no custom kernel needed);
  * bilinear triplane sampling (reference: src/models/renderer.py:292-317)
    -> manual bilinear gather matching F.grid_sample(align_corners=False,
    padding_mode='zeros') semantics bit-for-bit.

Plane/axis conventions (must match both sides of the pipeline):
  plane 0 "xy" <- point coords (x, y); plane 1 "xz" <- (x, z); plane 2 "yz" <- (y, z).
  The FIRST coordinate indexes plane WIDTH (columns), the SECOND indexes
  HEIGHT (rows) — exactly F.grid_sample's grid[..., 0]=x, grid[..., 1]=y.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PLANE_AXES = ((0, 1), (0, 2), (1, 2))


def plane_cell_index(points: jnp.ndarray, radius: float, resolution: int) -> jnp.ndarray:
    """Quantize points into per-plane cell ids.

    points: (..., N, 3) world coords. Returns (..., 3, N) int32 cell indices in
    [0, R^2), computed as col + R*row with col=floor(u0*R), row=floor(u1*R)
    after the [0,1] normalization used by the encoder
    (triplane_net.py:166-185).
    """
    p = jnp.clip(points, -radius + 1e-6, radius - 1e-6)
    u = (p + radius) / (2.0 * radius)  # (..., N, 3) in (0,1)
    idx = []
    for a0, a1 in PLANE_AXES:
        c0 = jnp.floor(u[..., a0] * resolution).astype(jnp.int32)
        c1 = jnp.floor(u[..., a1] * resolution).astype(jnp.int32)
        cell = jnp.clip(c0 + resolution * c1, 0, resolution * resolution - 1)
        idx.append(cell)
    return jnp.stack(idx, axis=-2)


def _segment_max_gather(values: jnp.ndarray, index: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-batch: (N, C), (N,) -> (N, C) where each point gets the max over its cell."""
    seg = jax.ops.segment_max(values, index, num_segments=size)
    seg = jnp.where(jnp.isfinite(seg), seg, 0.0)  # empty cells -> 0 (torch_scatter fills 0-init out)
    return jnp.take(seg, index, axis=0)


def pool_local_max(values: jnp.ndarray, cell_index: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """ConvONet-style local max-pool: for each point, the per-cell max of its
    features, summed over the three planes (triplane_net.py:226-237).

    values: (B, N, C); cell_index: (B, 3, N) -> (B, N, C).
    """
    size = resolution * resolution

    def one(v, idx3):
        out = 0.0
        for pi in range(3):
            out = out + _segment_max_gather(v, idx3[pi], size)
        return out

    return jax.vmap(one)(values, cell_index)


def scatter_mean_plane(values: jnp.ndarray, cell_index: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Mean-scatter features into plane cells (triplane_net.py:239-244).

    values: (B, N, C); cell_index: (B, N) -> (B, C, R, R). Empty cells are 0.
    """
    size = resolution * resolution

    def one(v, idx):
        s = jax.ops.segment_sum(v, idx, num_segments=size)  # (R^2, C)
        cnt = jax.ops.segment_sum(jnp.ones((v.shape[0], 1), v.dtype), idx, num_segments=size)
        mean = s / jnp.clip(cnt, 1.0)
        return mean

    planes = jax.vmap(one)(values, cell_index)  # (B, R^2, C)
    B, _, C = planes.shape
    # cell = col + R*row -> reshape row-major to (R rows, R cols)
    return planes.reshape(B, resolution, resolution, C).transpose(0, 3, 1, 2)


def build_triplanes(values: jnp.ndarray, points: jnp.ndarray, radius: float,
                    resolution: int) -> jnp.ndarray:
    """Scatter per-point features into 3 planes: (B,N,C),(B,N,3) -> (B,3,C,R,R)."""
    idx3 = plane_cell_index(points, radius, resolution)  # (B, 3, N)
    planes = [scatter_mean_plane(values, idx3[:, pi], resolution) for pi in range(3)]
    return jnp.stack(planes, axis=1)


# ---------------------------------------------------------------------------
# Bilinear sampling (F.grid_sample equivalent)
# ---------------------------------------------------------------------------

def grid_sample_2d(feat: jnp.ndarray, grid_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with align_corners=False, padding_mode='zeros'.

    feat: (C, H, W); grid_xy: (N, 2) in [-1, 1], [:,0]=x (width), [:,1]=y (height).
    Returns (N, C).

    TPU note: taps gather CHANNEL-CONTIGUOUS rows from an (H*W, C) view —
    a channel-first gather (C strided loads per tap) is an order of
    magnitude slower on TPU.
    """
    C, H, W = feat.shape
    feat_rows = jnp.transpose(feat, (1, 2, 0)).reshape(H * W, C)
    x = (grid_xy[:, 0] + 1.0) * (W * 0.5) - 0.5
    y = (grid_xy[:, 1] + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = jnp.take(feat_rows, yc * W + xc, axis=0)  # (N, C) contiguous
        return vals * (w * inb)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = (
        tap(x0i, y0i, wx0 * wy0)
        + tap(x0i + 1, y0i, wx1 * wy0)
        + tap(x0i, y0i + 1, wx0 * wy1)
        + tap(x0i + 1, y0i + 1, wx1 * wy1)
    )
    return out  # (N, C)


def grid_sample_2d_nhwc(feat: jnp.ndarray, grid_xy: jnp.ndarray) -> jnp.ndarray:
    """`grid_sample_2d` for channel-LAST planes: feat (H, W, C). Taps gather
    channel-contiguous rows directly — no (C,H,W)->(H*W,C) transpose pass,
    which at the renderer's 512^2 x 256 planes is a ~134MB/plane relayout
    the NCHW path pays on every sample call."""
    H, W, C = feat.shape
    feat_rows = feat.reshape(H * W, C)
    x = (grid_xy[:, 0] + 1.0) * (W * 0.5) - 0.5
    y = (grid_xy[:, 1] + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        # gather in the planes' dtype (HBM-bound), accumulate in fp32
        vals = jnp.take(feat_rows, yc * W + xc, axis=0)  # (N, C) contiguous
        return vals.astype(jnp.float32) * (w * inb)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (tap(x0i, y0i, wx0 * wy0)
            + tap(x0i + 1, y0i, wx1 * wy0)
            + tap(x0i, y0i + 1, wx0 * wy1)
            + tap(x0i + 1, y0i + 1, wx1 * wy1))


def sample_triplane(planes: jnp.ndarray, points: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Sample 3 planes and concat features (renderer.py:292-317).

    planes: (B, 3, C, H, W); points: (B, N, 3) world coords.
    Returns (B, N, 3*C) ordered [xy-plane feats, xz, yz].
    """
    u = jnp.clip(points / radius, -1.0, 1.0)

    def one(pl, uu):
        feats = []
        for pi, (a0, a1) in enumerate(PLANE_AXES):
            g = jnp.stack([uu[:, a0], uu[:, a1]], axis=-1)
            feats.append(grid_sample_2d(pl[pi], g))
        return jnp.concatenate(feats, axis=-1)

    return jax.vmap(one)(planes, u)


def sample_triplane_nhwc(planes: jnp.ndarray, points: jnp.ndarray,
                         radius: float) -> jnp.ndarray:
    """`sample_triplane` for channel-last planes: (B, 3, H, W, C) ->
    (B, N, 3*C) float32. Identical math/order to the NCHW version; the
    gather runs in the planes' dtype (bf16 halves the tap traffic) with
    fp32 bilinear weights/accumulation."""
    u = jnp.clip(points / radius, -1.0, 1.0)

    def one(pl, uu):
        feats = []
        for pi, (a0, a1) in enumerate(PLANE_AXES):
            g = jnp.stack([uu[:, a0], uu[:, a1]], axis=-1)
            feats.append(grid_sample_2d_nhwc(pl[pi], g))
        return jnp.concatenate(feats, axis=-1)

    return jax.vmap(one)(planes, u).astype(jnp.float32)


def grid_sample_2d_sparse(tiles: jnp.ndarray, slot: jnp.ndarray,
                          grid_xy: jnp.ndarray, grid: int, tile_px: int,
                          res: int) -> jnp.ndarray:
    """Bilinear sample from a sparse-tile plane (models/upsampler.py
    SparseTriplanes): tiles (cap, T, T, C) + slot (G*G,) tile->slot map.

    Identical math to grid_sample_2d; taps whose texel lies in an
    unevaluated tile read 0 (the halo in tile selection makes this occur
    only for points far outside the covered body region).
    """
    cap, T, _, C = tiles.shape
    rows = tiles.reshape(cap * T * T, C)
    x = (grid_xy[:, 0] + 1.0) * (res * 0.5) - 0.5
    y = (grid_xy[:, 1] + 1.0) * (res * 0.5) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
        xc = jnp.clip(xi, 0, res - 1)
        yc = jnp.clip(yi, 0, res - 1)
        tid = (yc // tile_px) * grid + (xc // tile_px)
        s = slot[tid]                                  # (N,), -1 if absent
        ok = inb & (s >= 0)
        sc = jnp.clip(s, 0)
        idx = sc * (T * T) + (yc % tile_px) * T + (xc % tile_px)
        vals = jnp.take(rows, idx, axis=0)             # (N, C)
        return vals.astype(jnp.float32) * (w * ok)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (tap(x0i, y0i, wx0 * wy0)
            + tap(x0i + 1, y0i, wx1 * wy0)
            + tap(x0i, y0i + 1, wx0 * wy1)
            + tap(x0i + 1, y0i + 1, wx1 * wy1))


def tile_halo(tiles: jnp.ndarray, slot: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Append a +1px bottom/right halo to sparse tiles from their covered
    neighbors: (cap, T, T, C) + slot (G*G,) -> (cap, T+1, T+1, C).

    halo col x=T of tile (r,c) = first column of tile (r,c+1) (0 if that
    tile is uncovered/out of grid); same for the bottom row and corner.
    With the halo, ANY bilinear 2x2 footprint whose top-left texel lies in
    a tile is one contiguous-start slab inside that tile's patch — the key
    to the single-gather sampler below.
    """
    cap, T, _, C = tiles.shape
    G2 = grid * grid
    # slot -> tile id (inverse of the slot map; holes map nowhere)
    tid = jnp.argmax(slot[None, :] == jnp.arange(cap)[:, None], axis=1)
    r = tid // grid
    c = tid % grid

    def neighbor(dr, dc):
        ok = (r + dr < grid) & (c + dc < grid)
        nt = jnp.clip(tid + dr * grid + dc, 0, G2 - 1)
        ns = jnp.where(ok, slot[nt], -1)
        return jnp.clip(ns, 0), (ns >= 0)

    nr, okr = neighbor(0, 1)
    nb, okb = neighbor(1, 0)
    nd, okd = neighbor(1, 1)
    zero = jnp.zeros((), tiles.dtype)
    right = jnp.where(okr[:, None, None], tiles[nr, :, 0, :], zero)  # (cap,T,C)
    bottom = jnp.where(okb[:, None, None], tiles[nb, 0, :, :], zero)
    corner = jnp.where(okd[:, None], tiles[nd, 0, 0, :], zero)      # (cap,C)
    top = jnp.concatenate([tiles, right[:, :, None, :]], axis=2)    # (cap,T,T+1,C)
    bot = jnp.concatenate([bottom, corner[:, None, :]], axis=1)     # (cap,T+1,C)
    return jnp.concatenate([top, bot[:, None, :, :]], axis=1)


def _lane_weights(x: jnp.ndarray, res: int):
    """Per-axis slab-lane weights for bilinear with zero padding.

    x: continuous texel coord. Returns (s, a0, a1): slab start s =
    clip(floor(x), 0, res-2) and the weights of texels s and s+1 such that
    a0*v[s] + a1*v[s+1] == the 2-tap masked lerp of floor(x), floor(x)+1
    (taps outside [0, res) weighted 0). d = floor(x) - s is in {-1, 0, 1};
    the selects re-map tap weights onto the clamped lanes.
    """
    x0 = jnp.floor(x)
    w1 = x - x0
    w0 = 1.0 - w1
    x0i = x0.astype(jnp.int32)
    s = jnp.clip(x0i, 0, res - 2)
    in0 = (x0i >= 0) & (x0i < res)
    in1 = (x0i + 1 >= 0) & (x0i + 1 < res)
    w0m = w0 * in0
    w1m = w1 * in1
    d = x0i - s
    a0 = jnp.where(d == 0, w0m, jnp.where(d == -1, w1m, 0.0))
    a1 = jnp.where(d == 0, w1m, jnp.where(d == 1, w0m, 0.0))
    return s, a0, a1


def grid_sample_2d_sparse_slab(tiles_h: jnp.ndarray, slot: jnp.ndarray,
                               grid_xy: jnp.ndarray, grid: int, tile_px: int,
                               res: int) -> jnp.ndarray:
    """`grid_sample_2d_sparse` as ONE (2, 2C) slab gather per point.

    tiles_h: haloed tiles (cap, T+1, T+1, C) from `tile_halo`. The 4 taps
    of each point live in one 2-row x 2C-contiguous slab of the top-left
    texel's tile patch, so the gather moves half the rows of the 4-tap
    form (the per-row descriptor cost dominates 512B-row gathers on TPU —
    measured 84 GiB/s). Differs from the 4-tap sampler ONLY when the
    top-left texel's tile is uncovered but a neighbor tap's tile is
    covered (point outside the halo'd coverage): the slab reads 0 for all
    taps. Exact (up to fp reassociation) under full coverage — tested.
    """
    cap, T1, _, C = tiles_h.shape
    x = (grid_xy[:, 0] + 1.0) * (res * 0.5) - 0.5
    y = (grid_xy[:, 1] + 1.0) * (res * 0.5) - 0.5
    sx, ax0, ax1 = _lane_weights(x, res)
    sy, ay0, ay1 = _lane_weights(y, res)
    tid = (sy // tile_px) * grid + (sx // tile_px)
    sl = slot[tid]                                   # (N,), -1 if absent
    ok = (sl >= 0).astype(jnp.float32)
    sc = jnp.clip(sl, 0)
    row = sc * T1 + (sy % tile_px)
    col = (sx % tile_px) * C
    op = tiles_h.reshape(cap * T1, T1 * C)
    starts = jnp.stack([row, col], axis=-1)          # (N, 2)
    slabs = jax.lax.gather(
        op, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2 * C), mode="clip")         # (N, 2, 2C)
    v = slabs.reshape(-1, 2, 2, C).astype(jnp.float32)
    bx0 = (ax0 * ok)[:, None]
    bx1 = (ax1 * ok)[:, None]
    return (ay0[:, None] * (bx0 * v[:, 0, 0] + bx1 * v[:, 0, 1])
            + ay1[:, None] * (bx0 * v[:, 1, 0] + bx1 * v[:, 1, 1]))


def sample_triplane_sparse_slab(sp, tiles_h: jnp.ndarray, points: jnp.ndarray,
                                radius: float) -> jnp.ndarray:
    """`sample_triplane_sparse` via the slab gather. tiles_h: haloed tiles
    (B, 3, cap, T+1, T+1, C) — build ONCE per plane set with `tile_halo`
    and reuse across sampling passes (the renderer samples twice)."""
    u = jnp.clip(points / radius, -1.0, 1.0)

    def one(th_b, slot_b, uu):
        feats = []
        for pi, (a0, a1) in enumerate(PLANE_AXES):
            g = jnp.stack([uu[:, a0], uu[:, a1]], axis=-1)
            feats.append(grid_sample_2d_sparse_slab(
                th_b[pi], slot_b[pi], g, sp.grid, sp.tile_px, sp.res))
        return jnp.concatenate(feats, axis=-1)

    return jax.vmap(one)(tiles_h, sp.slot, u).astype(jnp.float32)


def quad_rows(tiles: jnp.ndarray, slot: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Redundant QUAD layout for descriptor-bound sampling: (cap, T, T, C)
    -> (cap, T, T, 4C) where row (s, y, x) is the full 2x2 bilinear block
    [t(y,x) | t(y,x+1) | t(y+1,x) | t(y+1,x+1)] (cross-tile taps via
    tile_halo).

    TPU row gathers are DESCRIPTOR-bound, not byte-bound: a (180k, 1024)
    bf16 take costs the same as a (180k, 256) one (tools/gather_probe.py
    A1 vs A6), so storing each footprint as ONE row turns 4 tap gathers
    into 1 — ~4x on the sampling bucket (xprof: 173 ms/rollout). The 4x
    storage is transient (built per chunk, shared by both sampling passes).

    Built DIRECTLY from `tiles` + the 3 neighbor edge strips — no
    (cap, T+1, T+1, C) `tile_halo` intermediate: at serving scale the
    haloed array is ~1.3 GB/rollout written then re-read 4x by the tap
    slices (xprof_prod 2026-08-18: quad-layout assembly ~55 ms at
    ~110 GB/s); the direct form's taps are slices of `tiles` itself.
    Output is bit-identical to the halo+slice construction (tested).
    """
    cap, T, _, C = tiles.shape
    G2 = grid * grid
    # slot -> tile id (inverse of the slot map; holes map nowhere)
    tid = jnp.argmax(slot[None, :] == jnp.arange(cap)[:, None], axis=1)
    r = tid // grid
    c = tid % grid

    def neighbor(dr, dc):
        ok = (r + dr < grid) & (c + dc < grid)
        nt = jnp.clip(tid + dr * grid + dc, 0, G2 - 1)
        ns = jnp.where(ok, slot[nt], -1)
        return jnp.clip(ns, 0), (ns >= 0)

    nr, okr = neighbor(0, 1)
    nb, okb = neighbor(1, 0)
    nd, okd = neighbor(1, 1)
    zero = jnp.zeros((), tiles.dtype)
    right = jnp.where(okr[:, None, None], tiles[nr, :, 0, :], zero)  # (cap,T,C)
    bottom = jnp.where(okb[:, None, None], tiles[nb, 0, :, :], zero)
    corner = jnp.where(okd[:, None], tiles[nd, 0, 0, :], zero)       # (cap,C)

    tap0 = tiles
    tap1 = jnp.concatenate([tiles[:, :, 1:], right[:, :, None, :]], axis=2)
    tap2 = jnp.concatenate([tiles[:, 1:, :], bottom[:, None, :, :]], axis=1)
    # tap3 = th[1:, 1:]: interior shift; last col from the right strip
    # (rows 1..T-1) ending in the corner; last row from the bottom strip
    # (cols 1..T-1) ending in the corner.
    t3_top = jnp.concatenate(
        [tiles[:, 1:, 1:], right[:, 1:, None, :]], axis=2)   # (cap,T-1,T,C)
    t3_last = jnp.concatenate(
        [bottom[:, 1:, :], corner[:, None, :]], axis=1)      # (cap,T,C)
    tap3 = jnp.concatenate([t3_top, t3_last[:, None]], axis=1)
    return jnp.concatenate([tap0, tap1, tap2, tap3], axis=-1)


def _neighbor_slots(slot: jnp.ndarray, grid: int, cap: int):
    """Right/bottom/diag neighbor SLOT per slot, with missing/uncovered
    neighbors mapped to `cap` (the all-zero pad slot appended by the Pallas
    quad builder). Same neighbor logic as quad_rows/tile_halo."""
    G2 = grid * grid
    tid = jnp.argmax(slot[None, :] == jnp.arange(cap)[:, None], axis=1)
    r = tid // grid
    c = tid % grid

    def n(dr, dc):
        ok = (r + dr < grid) & (c + dc < grid)
        nt = jnp.clip(tid + dr * grid + dc, 0, G2 - 1)
        ns = jnp.where(ok, slot[nt], -1)
        return jnp.where(ns >= 0, ns, cap).astype(jnp.int32)

    return n(0, 1), n(1, 0), n(1, 1)


def _quad_kernel(nr_ref, nb_ref, nd_ref, t_ref, r_ref, b_ref, d_ref, o_ref):
    # All pieces stay 3-D (no newaxis getitem — jnp lowers newaxis via
    # gather, which Mosaic rejects; no expand_dims — a middle unit-dim
    # insert is an unsupported Mosaic shape cast). The strip refs are
    # blocked (T, 1, C) / (1, T, C) so only slices + concats remain.
    t = t_ref[0, 0]                      # (T, T, C)
    rcol = r_ref[0, 0]                   # (T, 1, C) right neighbor col x=0
    brow = b_ref[0, 0]                   # (1, T, C) bottom neighbor row y=0
    corn = d_ref[0, 0][0:1]              # (1, 1, C) diag neighbor texel (0,0)
    tap0 = t
    tap1 = jnp.concatenate([t[:, 1:, :], rcol], axis=1)
    tap2 = jnp.concatenate([t[1:, :, :], brow], axis=0)
    t3_top = jnp.concatenate([t[1:, 1:, :], rcol[1:]], axis=1)
    t3_last = jnp.concatenate([brow[:, 1:, :], corn], axis=1)
    tap3 = jnp.concatenate([t3_top, t3_last], axis=0)
    o_ref[0, 0] = jnp.concatenate([tap0, tap1, tap2, tap3], axis=-1)


def quad_rows_pallas(tiles: jnp.ndarray, slot: jnp.ndarray,
                     grid: int) -> jnp.ndarray:
    """`quad_rows` as ONE Pallas pass: (FP, cap, T, T, C) + (FP, G*G) ->
    (FP, cap, T, T, 4C), identical values.

    The XLA build assembles the 3 shifted taps with slices + concats that
    materialize ~55 ms/rollout of fragmented copies at ~110 GB/s
    (xprof_affine 2026-08-19: `_render_frame` slice 29.7 + concatenate
    15.1 + slice 10.4). This kernel reads each tile once plus three tiny
    edge strips (neighbor blocks routed by scalar-prefetched slot indices)
    and writes the quad row in one DMA — ~3 GB/chunk of traffic instead of
    ~6+ GB of fragmented copies. Missing neighbors read an appended
    all-zero pad slot, matching quad_rows' masked strips."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    FP, cap, T, _, C = tiles.shape
    nr, nb, nd = jax.vmap(lambda s: _neighbor_slots(s, grid, cap))(slot)
    # Mosaic lowers 2D scalar-prefetch indexing (nr[f, s]) to an unsupported
    # gather; flatten to 1D + flat scalar index, the pattern JAX's own
    # paged-attention kernel uses (page_indices.reshape(-1)).
    nr, nb, nd = nr.reshape(-1), nb.reshape(-1), nd.reshape(-1)
    zero = jnp.zeros((FP, 1, T, T, C), tiles.dtype)
    tiles_ext = jnp.concatenate([tiles, zero], axis=1)  # (FP, cap+1, ...)
    # edge strips (strided slices of tiles_ext — small: cap*T*C per frame);
    # kept 5-D ((T,1,C)/(1,T,C) blocks) so the kernel needs no reshapes.
    rstrips = tiles_ext[:, :, :, 0:1, :]                # (FP, cap+1, T, 1, C)
    bstrips = tiles_ext[:, :, 0:1, :, :]                # (FP, cap+1, 1, T, C)

    def _at(a, i):
        return a[i]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(FP, cap),
        in_specs=[
            pl.BlockSpec((1, 1, T, T, C), lambda f, s, nr, nb, nd: (f, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, C),
                         lambda f, s, nr, nb, nd: (f, _at(nr, f * cap + s), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T, C),
                         lambda f, s, nr, nb, nd: (f, _at(nb, f * cap + s), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, 1, C),
                         lambda f, s, nr, nb, nd: (f, _at(nd, f * cap + s), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, T, T, 4 * C),
                               lambda f, s, nr, nb, nd: (f, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _quad_kernel,
        out_shape=jax.ShapeDtypeStruct((FP, cap, T, T, 4 * C), tiles.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * FP * cap * T * T * C * 2 * 5,
            transcendentals=0),
    )(nr, nb, nd, tiles_ext, rstrips, bstrips, rstrips)


def build_quad(tiles: jnp.ndarray, slot: jnp.ndarray, grid: int,
               builder: str = "xla") -> jnp.ndarray:
    """(B, 3, cap, T, T, C) tiles + (B, 3, G*G) slot -> (B, 3, cap, T, T,
    4C) quad rows via the XLA or Pallas builder (identical values)."""
    if builder == "pallas" and jax.default_backend() == "tpu":
        B, P = tiles.shape[:2]
        flat = tiles.reshape((B * P,) + tiles.shape[2:])
        q = quad_rows_pallas(flat, slot.reshape(B * P, -1), grid)
        return q.reshape(tiles.shape[:2] + q.shape[1:])
    return jax.vmap(jax.vmap(lambda t, s: quad_rows(t, s, grid)))(tiles, slot)


def slot_rank(sorted_ids: jnp.ndarray, tid: jnp.ndarray):
    """Slot lookup WITHOUT a gather: select_tiles assigns slots in
    ascending tile-id order, so a tile's slot equals its rank in
    `sorted_ids` ((cap,) ascending covered ids, invalid padded with an
    out-of-range sentinel). Two fused (N, cap) compare-reductions replace
    the descriptor-bound (N,) slot-table gather (those gathers were
    ~16 ms/rollout at the serving scale — xprof). Returns (slot (N,) int32,
    present (N,) bool); slot is meaningful only where present."""
    t = sorted_ids[None, :]
    v = tid[:, None]
    lt = (t < v).sum(axis=1).astype(jnp.int32)
    le = (t <= v).sum(axis=1).astype(jnp.int32)
    return lt, le > lt


def grid_sample_2d_sparse_quad(quad: jnp.ndarray, sorted_ids: jnp.ndarray,
                               grid_xy: jnp.ndarray, grid: int, tile_px: int,
                               res: int) -> jnp.ndarray:
    """`grid_sample_2d_sparse` as ONE row gather per point from the quad
    layout (`quad_rows`); slot resolution via `slot_rank` (no gather).
    Same top-left-texel tile routing as the slab sampler: differs from the
    4-tap form only for points outside the halo'd coverage (reads 0).
    Exact under full coverage — tested."""
    cap, T, _, C4 = quad.shape
    C = C4 // 4
    rows = quad.reshape(cap * T * T, C4)
    x = (grid_xy[:, 0] + 1.0) * (res * 0.5) - 0.5
    y = (grid_xy[:, 1] + 1.0) * (res * 0.5) - 0.5
    sx, ax0, ax1 = _lane_weights(x, res)
    sy, ay0, ay1 = _lane_weights(y, res)
    tid = (sy // tile_px) * grid + (sx // tile_px)
    sl, present = slot_rank(sorted_ids, tid)
    ok = present.astype(jnp.float32)
    sc = jnp.clip(sl, 0, cap - 1)
    idx = sc * (T * T) + (sy % tile_px) * T + (sx % tile_px)
    # idx is in-bounds by construction (sc<=cap-1, sy%T<T) -> mode='clip'
    # drops the out-of-bounds select. The combine is lane-aligned slices of
    # the (N, 4C) bf16 gather with the f32 convert applied PER SLICE: a
    # single whole-array astype(f32) before slicing has 4 consumers, so XLA
    # materializes it — 1.79 ms x ~19 convert HLOs f32[180000,1024] in the
    # prod trace (xprof_prod 2026-08-18, ~34 ms/rollout). Converting after
    # each slice fuses convert+mul+add into one kLoop over the bf16 rows.
    # Same math: f32 weights x f32-converted bf16 taps, in either order.
    v = jnp.take(rows, idx, axis=0, mode="clip")
    w00 = (ay0 * ax0 * ok)[:, None]
    w01 = (ay0 * ax1 * ok)[:, None]
    w10 = (ay1 * ax0 * ok)[:, None]
    w11 = (ay1 * ax1 * ok)[:, None]

    def tap(i):
        return v[:, i * C:(i + 1) * C].astype(jnp.float32)

    return w00 * tap(0) + w01 * tap(1) + w10 * tap(2) + w11 * tap(3)


def sample_triplane_sparse_quad(sp, quad: jnp.ndarray, points: jnp.ndarray,
                                radius: float) -> jnp.ndarray:
    """`sample_triplane_sparse` via the quad-row gather. quad: (B, 3, cap,
    T, T, 4C) from `quad_rows` — build ONCE per plane set and reuse across
    sampling passes (the renderer samples twice). Requires sp.sorted_ids
    (SparseTriplanes built by select_tiles)."""
    u = jnp.clip(points / radius, -1.0, 1.0)

    def one(q_b, ids_b, uu):
        feats = []
        for pi, (a0, a1) in enumerate(PLANE_AXES):
            g = jnp.stack([uu[:, a0], uu[:, a1]], axis=-1)
            feats.append(grid_sample_2d_sparse_quad(
                q_b[pi], ids_b[pi], g, sp.grid, sp.tile_px, sp.res))
        return jnp.concatenate(feats, axis=-1)

    return jax.vmap(one)(quad, sp.sorted_ids, u).astype(jnp.float32)


def sample_triplane_sparse(sp, points: jnp.ndarray,
                           radius: float) -> jnp.ndarray:
    """`sample_triplane` over SparseTriplanes: (B, N, 3) world points ->
    (B, N, 3*C) float32, ordered [xy, xz, yz] like the dense samplers."""
    u = jnp.clip(points / radius, -1.0, 1.0)

    def one(tiles_b, slot_b, uu):
        feats = []
        for pi, (a0, a1) in enumerate(PLANE_AXES):
            g = jnp.stack([uu[:, a0], uu[:, a1]], axis=-1)
            feats.append(grid_sample_2d_sparse(
                tiles_b[pi], slot_b[pi], g, sp.grid, sp.tile_px, sp.res))
        return jnp.concatenate(feats, axis=-1)

    return jax.vmap(one)(sp.tiles, sp.slot, u).astype(jnp.float32)


def tokens_to_planes(tokens: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """(..., C, 3*R*R) channel-first tokens -> (..., 3, C, R, R)."""
    *lead, C, S = tokens.shape
    assert S == 3 * resolution * resolution, (S, resolution)
    x = tokens.reshape(*lead, C, 3, resolution, resolution)
    return jnp.moveaxis(x, -4, -3)  # swap C and the plane axis


def planes_to_tokens(planes: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, C, R, R) -> (..., C, 3*R*R)."""
    *lead, P, C, H, W = planes.shape
    x = jnp.moveaxis(planes, -4, -3)  # (..., C, 3, R, R)
    return x.reshape(*lead, C, P * H * W)
