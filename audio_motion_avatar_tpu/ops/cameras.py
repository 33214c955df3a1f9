"""Camera math for the Gaussian-splatting pipeline, pure JAX.

Semantics match the reference GS camera stack
(reference: src/utils/graphic_utils.py:60-145, src/models/renderer.py:481-533):

* extrinsic E is a 4x4 world->camera (OpenCV convention, +z forward);
* intrinsic K is a 3x3 pixel-space matrix;
* the NDC projection is built directly from K (getProjectionMatrix_torch),
  znear=0.01 / zfar=100 as in render_one.

Everything is batched over arbitrary leading dims and jit-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

ZNEAR = 0.01
ZFAR = 100.0


def focal2fov(focal: jnp.ndarray, pixels: float) -> jnp.ndarray:
    """graphic_utils.py:144-145."""
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


def fov2focal(fov: jnp.ndarray, pixels: float) -> jnp.ndarray:
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def world_to_view(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """World->camera 4x4 from the extrinsic.

    The reference round-trips E through getWorld2View2 (R^T/t repacking +
    double inverse, graphic_utils.py:67-78) which is the identity map on a
    rigid extrinsic; here it is used as-is.
    """
    return extrinsic


def projection_ndc(K: jnp.ndarray, width: float, height: float,
                   znear: float = ZNEAR, zfar: float = ZFAR) -> jnp.ndarray:
    """4x4 NDC projection from pixel intrinsics (graphic_utils.py:124-136).

    Maps camera space to NDC where x,y in [-1,1] and the w coordinate is the
    camera-space depth. K may have leading batch dims: (..., 3, 3) -> (..., 4, 4).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    px = K[..., 0, 2]
    py = K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    z1 = jnp.full_like(fx, zfar / (zfar - znear))
    z2 = jnp.full_like(fx, -zfar * znear / (zfar - znear))
    row0 = jnp.stack([2 * fx / width, zero, (2 * px - width) / width, zero], axis=-1)
    row1 = jnp.stack([zero, 2 * fy / height, (2 * py - height) / height, zero], axis=-1)
    row2 = jnp.stack([zero, zero, z1, z2], axis=-1)
    row3 = jnp.stack([zero, zero, one, zero], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def camera_center(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """Camera position in world coords: -R^T t for E=[R|t]."""
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    return -jnp.einsum("...ij,...i->...j", R, t, precision="highest")


class Camera(NamedTuple):
    """Static-shape camera bundle for the splat renderer."""

    view: jnp.ndarray        # (..., 4, 4) world->camera
    proj: jnp.ndarray        # (..., 4, 4) camera->NDC
    center: jnp.ndarray      # (..., 3) world-space camera center
    tan_fovx: jnp.ndarray    # (...,)
    tan_fovy: jnp.ndarray    # (...,)
    width: int
    height: int


def make_camera(K: jnp.ndarray, E: jnp.ndarray, width: int, height: int) -> Camera:
    """Build the Camera bundle from pixel intrinsics + world->camera extrinsic.

    Mirrors render_one's setup (renderer.py:486-510) without the transposed
    matrix plumbing the CUDA rasterizer needs.
    """
    fovx = focal2fov(K[..., 0, 0], float(width))
    fovy = focal2fov(K[..., 1, 1], float(height))
    return Camera(
        view=world_to_view(E),
        proj=projection_ndc(K, float(width), float(height)),
        center=camera_center(E),
        tan_fovx=jnp.tan(fovx * 0.5),
        tan_fovy=jnp.tan(fovy * 0.5),
        width=width,
        height=height,
    )


def transform_points(mat4: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) -> (..., N, 3) homogeneous w-divide-free."""
    return jnp.einsum("...ij,...nj->...ni", mat4[..., :3, :3], points, precision="highest") + mat4[..., None, :3, 3]


def project_points(mat4: jnp.ndarray, points: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Full homogeneous projection with w-divide: (..., N, 3) -> (..., N, 3) NDC."""
    p = jnp.einsum("...ij,...nj->...ni", mat4[..., :3, :3], points, precision="highest") + mat4[..., None, :3, 3]
    w = jnp.einsum("...j,...nj->...n", mat4[..., 3, :3], points, precision="highest") + mat4[..., None, 3, 3]
    w = jnp.where(jnp.abs(w) < eps, jnp.sign(w) * eps + (w == 0) * eps, w)
    return p / w[..., None]


def project_xyz(xyz: jnp.ndarray, K: jnp.ndarray, E: jnp.ndarray) -> jnp.ndarray:
    """Pixel-space projection (graphic_utils.py:249-273): (..., N, 3) -> (..., N, 2)."""
    cam = transform_points(E, xyz)
    uvw = jnp.einsum("...ij,...nj->...ni", K, cam, precision="highest")
    return uvw[..., :2] / jnp.clip(uvw[..., 2:3], 1e-7)
