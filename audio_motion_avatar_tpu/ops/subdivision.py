"""Static mesh subdivision / densification tables.

The reference densifies SMPLX vertices two ways:
  1. face-center densification: verts -> concat(verts, per-face centroids)
     (reference: src/models/triplane_net.py:296-302);
  2. midpoint subdivision via pytorch3d.SubdivideMeshes, applied `steps`
     times, then random sub-selection to a fixed count
     (reference: src/models/renderer.py:227-290).

The SMPLX topology is STATIC, so on TPU both become precomputed index tables
applied as gathers — no dynamic mesh structure at runtime. Table construction
happens once on host (numpy); application is pure JAX.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class SubdivisionTables(NamedTuple):
    """Per-step edge tables: new verts are midpoints of `edges` rows."""

    edges: Tuple[np.ndarray, ...]        # each (E_i, 2) int32 into the prev level's verts
    faces: Tuple[np.ndarray, ...]        # faces AFTER each step, (F_i, 4... ) -> (F_i,3)
    num_verts: Tuple[int, ...]           # vert count after each step


def _subdivide_once(num_verts: int, faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """One midpoint subdivision step on host.

    Returns (edges (E,2) sorted-unique, new_faces (4F,3)). New vertex k sits at
    the midpoint of edges[k] and has index num_verts + k — identical vertex
    ordering to pytorch3d.SubdivideMeshes.
    """
    f = np.asarray(faces, np.int64)
    e01 = f[:, [0, 1]]
    e12 = f[:, [1, 2]]
    e20 = f[:, [2, 0]]
    all_edges = np.concatenate([e01, e12, e20], axis=0)
    all_edges.sort(axis=1)
    edges, inverse = np.unique(all_edges, axis=0, return_inverse=True)
    F = f.shape[0]
    m01 = num_verts + inverse[:F]
    m12 = num_verts + inverse[F:2 * F]
    m20 = num_verts + inverse[2 * F:]
    new_faces = np.concatenate(
        [
            np.stack([f[:, 0], m01, m20], axis=1),
            np.stack([f[:, 1], m12, m01], axis=1),
            np.stack([f[:, 2], m20, m12], axis=1),
            np.stack([m01, m12, m20], axis=1),
        ],
        axis=0,
    )
    return edges.astype(np.int32), new_faces.astype(np.int32)


def build_subdivision(num_verts: int, faces: np.ndarray, steps: int) -> SubdivisionTables:
    edges_list, faces_list, counts = [], [], []
    cur_faces = np.asarray(faces, np.int32)
    cur_n = num_verts
    for _ in range(steps):
        edges, cur_faces = _subdivide_once(cur_n, cur_faces)
        cur_n = cur_n + edges.shape[0]
        edges_list.append(edges)
        faces_list.append(cur_faces)
        counts.append(cur_n)
    return SubdivisionTables(tuple(edges_list), tuple(faces_list), tuple(counts))


def apply_subdivision(verts: jnp.ndarray, tables: SubdivisionTables) -> jnp.ndarray:
    """(..., V, 3) -> (..., V', 3) by appending edge midpoints per step."""
    out = verts
    for edges in tables.edges:
        e = jnp.asarray(edges)
        mids = 0.5 * (jnp.take(out, e[:, 0], axis=-2) + jnp.take(out, e[:, 1], axis=-2))
        out = jnp.concatenate([out, mids], axis=-2)
    return out


def face_center_densify(verts: jnp.ndarray, faces: np.ndarray) -> jnp.ndarray:
    """verts (..., V, 3) + static faces (F,3) -> (..., V+F, 3).

    Matches SMPLXTriplaneEncoder.get_smplx_verts densification
    (triplane_net.py:296-302): append per-face centroids.
    """
    f = jnp.asarray(faces, jnp.int32)
    fv = jnp.take(verts, f.reshape(-1), axis=-2)
    fv = fv.reshape(verts.shape[:-2] + (f.shape[0], 3, 3))
    centers = fv.mean(axis=-2)
    return jnp.concatenate([verts, centers], axis=-2)


def fixed_subselect(num_available: int, num_keep: int, seed: int = 0) -> np.ndarray:
    """Static random permutation subselection indices.

    The reference draws a fresh torch.randperm every forward
    (renderer.py:287-288); on TPU we freeze one permutation at build time —
    the subset is arbitrary either way, and a static gather keeps the graph
    shape-stable.
    """
    rng = np.random.RandomState(seed)
    return rng.permutation(num_available)[:num_keep].astype(np.int32)
