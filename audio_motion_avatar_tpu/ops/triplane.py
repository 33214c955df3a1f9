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
