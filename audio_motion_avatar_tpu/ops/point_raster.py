"""Point rasterization for vertex->image feature lifting, pure JAX.

TPU-native replacement for the pytorch3d PointsRasterizer path the reference
uses to give each SMPLX vertex the image feature it projects onto, with
z-occlusion (reference: src/utils/graphic_utils.py:275-331, called from
src/models/triplane_net.py:140-157).

Design: the reference rasterizes 1 point per pixel with a ~1px radius and
keeps the nearest point per pixel; occluded / off-screen points read zeros.
The XLA formulation is a two-pass z-buffer built from segment_min over
flattened pixel ids — O(N) scatter, static shapes, no sorting:

  pass 1: depth_buffer[pix] = min depth of points landing on pix
  pass 2: a point is visible iff its depth == depth_buffer[its pix] (eps),
          and it reads image_features[:, py, px].

Deviation from pytorch3d (documented): the splat radius is one pixel (the
pixel the point center lands in) instead of an NDC-radius disc; with
radius=0.0075 at 1024px the reference disc is ~4px, but only the
points_per_pixel=1 winner is kept, so the nearest-pixel approximation
changes only silhouette-edge assignments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_DEPTH = 1e10


def project_to_pixels(points: jnp.ndarray, extrinsic: jnp.ndarray,
                      intrinsic: jnp.ndarray):
    """points (N,3) world -> (pix_x, pix_y float, depth). OpenCV convention."""
    cam = points @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    z = cam[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = intrinsic[0, 0] * cam[:, 0] / z_safe + intrinsic[0, 2]
    v = intrinsic[1, 1] * cam[:, 1] / z_safe + intrinsic[1, 2]
    return u, v, z


def lift_image_features(points: jnp.ndarray, extrinsic: jnp.ndarray,
                        intrinsic: jnp.ndarray, image_features: jnp.ndarray,
                        z_eps: float = 1e-4) -> jnp.ndarray:
    """Per-point image features with z-occlusion.

    points: (B, N, 3) world; extrinsic: (B, 4, 4); intrinsic: (B, 3, 3);
    image_features: (B, C, H, W). Returns (B, N, C); hidden/off-screen -> 0.
    """
    B, C, H, W = image_features.shape

    def one(pts, E, K, feat):
        u, v, z = project_to_pixels(pts, E, K)
        px = jnp.floor(u).astype(jnp.int32)
        py = jnp.floor(v).astype(jnp.int32)
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)
        pix = jnp.where(inb, py * W + px, H * W)  # out-of-bounds bucket at end
        depth = jnp.where(inb, z, BIG_DEPTH)

        zbuf = jax.ops.segment_min(depth, pix, num_segments=H * W + 1)
        visible = inb & (depth <= zbuf[pix] + z_eps)

        # channel-contiguous gather (see ops/triplane.py TPU note)
        feat_rows = jnp.transpose(feat.reshape(C, H * W), (1, 0))
        px_c = jnp.clip(pix, 0, H * W - 1)
        sampled = jnp.take(feat_rows, px_c, axis=0)  # (N, C)
        return jnp.where(visible[:, None], sampled, 0.0)

    return jax.vmap(one)(points, extrinsic, intrinsic, image_features)
