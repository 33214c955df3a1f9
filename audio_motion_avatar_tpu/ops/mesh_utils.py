"""Mesh geometry helpers, pure JAX.

Equivalents of the reference's mesh math in graphic_utils.py: safe
normalization (:147-160), face/vertex normals (:162-213), face orientation
frames (:173-192), clip-space transform (:462-487), and a mesh Laplacian
smoothing loss (the pytorch3d `mesh_laplacian_smoothing` import at
lightning_model_wrapper.py:14) built on static topology.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * dot(x, n) * n - x


def length(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.sqrt(jnp.clip(dot(x, x), eps))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / length(x, eps)


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """verts (..., V, 3), faces (F, 3) -> (..., F, 3) (unnormalized)."""
    f = jnp.asarray(faces, jnp.int32)
    v0 = jnp.take(verts, f[:, 0], axis=-2)
    v1 = jnp.take(verts, f[:, 1], axis=-2)
    v2 = jnp.take(verts, f[:, 2], axis=-2)
    return jnp.cross(v1 - v0, v2 - v0)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via segment scatter; degenerate verts
    get +z (graphic_utils.py:194-213)."""
    fn = face_normals(verts, faces)
    f = jnp.asarray(faces, jnp.int32)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[..., f[:, k], :].add(fn)
    bad = dot(vn, vn) <= 1e-20
    vn = jnp.where(bad, jnp.asarray([0.0, 0.0, 1.0]), vn)
    return safe_normalize(vn)


def face_orientation(verts: jnp.ndarray, faces: jnp.ndarray):
    """Per-face orthonormal frame + scale (graphic_utils.py:173-192)."""
    f = jnp.asarray(faces, jnp.int32)
    v0 = jnp.take(verts, f[:, 0], axis=-2)
    v1 = jnp.take(verts, f[:, 1], axis=-2)
    v2 = jnp.take(verts, f[:, 2], axis=-2)
    a0 = safe_normalize(v1 - v0)
    a1 = safe_normalize(jnp.cross(a0, v2 - v0))
    a2 = -safe_normalize(jnp.cross(a1, a0))
    orient = jnp.stack([a0, a1, a2], axis=-1)
    s0 = length(v1 - v0)
    s1 = jnp.abs(dot(a2, v2 - v0))
    return orient, (s0 + s1) / 2.0


def clip_from_world(points: jnp.ndarray, view: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """World -> clip space homogeneous coords (graphic_utils clip_T_world)."""
    p = jnp.concatenate([points, jnp.ones(points.shape[:-1] + (1,))], axis=-1)
    return p @ (proj @ view).T


def build_laplacian(num_verts: int, faces: np.ndarray):
    """Host-precomputed uniform Laplacian neighbor tables for the static
    SMPLX topology: (neighbors (V, Dmax) int32, mask (V, Dmax))."""
    f = np.asarray(faces)
    adj = [set() for _ in range(num_verts)]
    for a, b, c in f:
        adj[a].update((b, c))
        adj[b].update((a, c))
        adj[c].update((a, b))
    dmax = max(1, max(len(s) for s in adj))
    nbr = np.zeros((num_verts, dmax), np.int32)
    mask = np.zeros((num_verts, dmax), bool)
    for i, s in enumerate(adj):
        ns = sorted(s)
        nbr[i, : len(ns)] = ns
        mask[i, : len(ns)] = True
    return nbr, mask


def laplacian_smoothing_loss(verts: jnp.ndarray, nbr: np.ndarray,
                             mask: np.ndarray) -> jnp.ndarray:
    """Uniform-weight Laplacian magnitude, mean over vertices — the
    pytorch3d mesh_laplacian_smoothing('uniform') analog on static tables."""
    nbr = jnp.asarray(nbr)
    m = jnp.asarray(mask, verts.dtype)[..., None]
    neigh = jnp.take(verts, nbr.reshape(-1), axis=-2)
    neigh = neigh.reshape(verts.shape[:-2] + nbr.shape + (3,))
    deg = jnp.clip(m.sum(-2), 1.0)
    center = (neigh * m).sum(-2) / deg
    lap = center - verts
    return jnp.linalg.norm(lap, axis=-1).mean()
