"""Space-filling-curve serialization for point clouds, pure JAX int ops.

TPU-native port of the reference's serialization layer (reference:
src/models/point_transformer/serialization/{default,z_order,hilbert}.py):
z-order (Morton) codes via bit interleaving and Hilbert codes via the
Skilling transform, both as vectorized int32 ops (x64 stays off: 3 axes x
10 bits = 30-bit codes fit int32).

Unlike the reference we don't pack batch ids into high bits — batching is a
vmap axis. "-trans" orders permute the axes before encoding, matching the
reference's z-trans / hilbert-trans variants (default.py:8-38).
"""

from __future__ import annotations

import jax.numpy as jnp

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of x so there are 2 zero bits between each
    (standard Morton magic-number spread for 32-bit lanes)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def z_encode(grid: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """grid: (..., 3) non-negative int32 -> (...,) Morton code.
    Bit layout matches the convention x-minor: code = x | y<<1 | z<<2 spread."""
    x = _part1by2(grid[..., 0].astype(jnp.int32))
    y = _part1by2(grid[..., 1].astype(jnp.int32))
    z = _part1by2(grid[..., 2].astype(jnp.int32))
    return x | (y << 1) | (z << 2)


def hilbert_encode(grid: jnp.ndarray, depth: int = 10) -> jnp.ndarray:
    """Hilbert curve index via the Skilling (1983) Gray-code transform,
    vectorized over points. grid: (..., 3) int in [0, 2^depth)."""
    n = 3
    x = [grid[..., i].astype(jnp.int32) for i in range(n)]

    # Skilling transform: convert coordinates to the Hilbert-transposed form.
    m = 1 << (depth - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            bit_set = (x[i] & q) != 0
            # invert low bits of x[0], or exchange low bits of x[0] and x[i]
            if i == 0:
                x[0] = jnp.where(bit_set, x[0] ^ p, x[0])  # exchange is a no-op
            else:
                t = (x[0] ^ x[i]) & p
                x[0], x[i] = (
                    jnp.where(bit_set, x[0] ^ p, x[0] ^ t),
                    jnp.where(bit_set, x[i], x[i] ^ t),
                )
        q >>= 1

    # Gray decode
    for i in range(1, n):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q = m
    while q > 1:
        t = jnp.where((x[n - 1] & q) != 0, t ^ (q - 1), t)
        q >>= 1
    for i in range(n):
        x[i] = x[i] ^ t

    # Interleave transposed bits into a single index (x[0] carries the MSBs).
    code = jnp.zeros_like(x[0])
    for b in range(depth - 1, -1, -1):
        for i in range(n):
            code = (code << 1) | ((x[i] >> b) & 1)
    return code


_TRANS = (1, 2, 0)  # axis permutation for the '-trans' variants


def encode(grid: jnp.ndarray, order: str = "z", depth: int = 10) -> jnp.ndarray:
    if order.endswith("-trans"):
        grid = grid[..., jnp.array(_TRANS)]
        order = order[: -len("-trans")]
    if order == "z":
        return z_encode(grid, depth)
    if order == "hilbert":
        return hilbert_encode(grid, depth)
    raise ValueError(order)


def grid_coords(points: jnp.ndarray, grid_resolution: float, depth: int = 10) -> jnp.ndarray:
    """points (..., 3) float -> non-negative int grid coords, clipped to
    the curve's bit depth. Matches the reference quantization
    grid_coord = floor(coord * grid_res) (point_encoder.py:25-39) with an
    offset to keep coords non-negative."""
    g = jnp.floor(points * grid_resolution).astype(jnp.int32)
    g = g - jnp.min(g, axis=tuple(range(g.ndim - 1)), keepdims=True)
    return jnp.clip(g, 0, (1 << depth) - 1)
