"""Rotation representation conversions, pure JAX.

TPU-native replacement for the pytorch3d.transforms usage in the reference
(reference: src/models/smplx_decoder.py:4, src/utils/loss_utils.py:105).
Conventions match pytorch3d: quaternions are (w, x, y, z), rotation matrices
act on column vectors, 6D rotations are the first two rows of the matrix
(Zhou et al. continuity representation).

All functions operate on the last axis/axes and broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Equivalent of smplx.lbs.batch_rodrigues (reference loss_utils.py:105-131)
    with a Taylor-safe small-angle branch.
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)  # (..., 1)
    small = sq < 1e-12
    # Double-where: keep sqrt away from 0 so gradients stay finite on the
    # untaken branch (both branches are evaluated under jit).
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    angle = jnp.sqrt(safe_sq)

    x, y, z = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zeros = jnp.zeros_like(x)
    # Skew of the RAW vector: Kf = [[0,-z,y],[z,0,-x],[-y,x,0]]
    Kf = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    a = angle[..., None]  # (..., 1, 1)
    K = Kf / a
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), Kf.shape)
    R = eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)
    # Small-angle: R ~= I + Kf + Kf^2/2 (second-order Taylor, no division)
    R_small = eye + Kf + 0.5 * (Kf @ Kf)
    return jnp.where(small[..., None], R_small, R)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3). Normalizes the input."""
    quat = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz quaternion, w >= 0.

    Branch-free "largest diagonal" selection so gradients stay finite for
    every rotation.
    """
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    # Four candidate squared magnitudes (non-negative up to fp error).
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions built from each pivot, each scaled by 4*pivot.
    cand_w = jnp.stack(
        [qw2, m[..., 2, 1] - m[..., 1, 2], m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]],
        axis=-1,
    )
    cand_x = jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2], qx2, m[..., 1, 0] + m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0]],
        axis=-1,
    )
    cand_y = jnp.stack(
        [m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] + m[..., 0, 1], qy2, m[..., 2, 1] + m[..., 1, 2]],
        axis=-1,
    )
    cand_z = jnp.stack(
        [m[..., 1, 0] - m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0], m[..., 2, 1] + m[..., 1, 2], qz2],
        axis=-1,
    )
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (..., 4)
    best = jnp.argmax(mags, axis=-1)  # (...,)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    pivot = jnp.take_along_axis(mags, best[..., None], axis=-1)
    q = q / jnp.clip(2.0 * jnp.sqrt(jnp.clip(pivot, _EPS)), _EPS)
    # Canonicalize sign: w >= 0 (pytorch3d convention).
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3) axis-angle."""
    quat = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w = quat[..., :1]
    v = quat[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    # sin(angle/2) = vn; axis = v / vn. For small vn use Taylor:
    # axis_angle = v * (angle / vn) ~= v * (2 / w) * (1 - vn^2 / (3 w^2)) at vn->0
    small = vn < 1e-6
    safe_vn = jnp.where(small, jnp.ones_like(vn), vn)
    scale = jnp.where(small, 2.0 / jnp.clip(jnp.abs(w), _EPS) * jnp.sign(w + (w == 0)), angle / safe_vn)
    return v * scale


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3), via quaternion (pytorch3d-compatible path)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) wxyz."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    safe = jnp.where(small, jnp.ones_like(angle), angle)
    # sin(half)/angle, Taylor: 0.5 - angle^2/48
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / safe)
    return jnp.concatenate([jnp.cos(half), axis_angle * k], axis=-1)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) Zhou et al. 6D rotation -> (..., 3, 3) via Gram-Schmidt.

    Matches pytorch3d.transforms.rotation_6d_to_matrix: the 6 numbers are the
    first two ROWS of the matrix.
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.clip(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two rows, flattened."""
    return jnp.concatenate([matrix[..., 0, :], matrix[..., 1, :]], axis=-1)


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    """Composition used by the SMPLX decoder heads (smplx_decoder.py:106-127)."""
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def normalize_quaternion(quat: jnp.ndarray) -> jnp.ndarray:
    return quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
