"""SMPL-X body model as pure JAX functions (blend shapes + FK + LBS).

TPU-native replacement for the `smplx` package usage in the reference
(reference: src/models/triplane_net.py:246-318, src/models/renderer.py:206-290).
Design notes:

* The model tensors live in a `SmplxModel` NamedTuple pytree so the whole
  thing can be closed over by jit / donated / sharded like any other array
  bundle. Vertex/joint counts are static, which keeps every downstream shape
  static (XLA requirement, and true of SMPLX anyway: V=10475, J=55).
* The kinematic chain is composed with a scan-free unrolled loop over the 55
  joints (static topology -> 55 batched 4x4 matmuls fused by XLA).
* `synthetic_model()` builds a structurally identical random model so every
  test/bench runs without the proprietary SMPLX asset; `load_model()` reads
  the real .npz/.pkl release for parity runs.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from .rotations import axis_angle_to_matrix

NUM_BODY_JOINTS = 21      # excluding the root
NUM_HAND_JOINTS = 15      # per hand
NUM_FACE_JOINTS = 3       # jaw, leye, reye
NUM_JOINTS = 1 + NUM_BODY_JOINTS + NUM_FACE_JOINTS + 2 * NUM_HAND_JOINTS  # 55
SMPLX_NUM_VERTS = 10475
SMPLX_NUM_FACES = 20908


class SmplxModel(NamedTuple):
    """Static SMPL-X model tensors (a pytree of jnp arrays)."""

    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, num_betas) shape blend shapes
    exprdirs: jnp.ndarray      # (V, 3, num_expr) expression blend shapes
    posedirs: jnp.ndarray      # ((J-1)*9, V*3) pose blend shapes
    J_regressor: jnp.ndarray   # (J, V)
    parents: jnp.ndarray       # (J,) int32; parents[0] == -1 by convention
    lbs_weights: jnp.ndarray   # (V, J)
    left_hand_mean: jnp.ndarray   # (45,)
    right_hand_mean: jnp.ndarray  # (45,)
    faces: jnp.ndarray         # (F, 3) int32 (host-precomputed topology)


def default_params(batch_shape=(), num_betas: int = 10, num_expr: int = 10,
                   dtype=jnp.float32) -> dict:
    """Zero (rest-pose) parameter dict with the reference's key layout."""
    def z(*shape):
        return jnp.zeros(batch_shape + shape, dtype)
    return {
        "global_orient": z(3),
        "body_pose": z(NUM_BODY_JOINTS * 3),
        "betas": z(num_betas),
        "left_hand_pose": z(NUM_HAND_JOINTS * 3),
        "right_hand_pose": z(NUM_HAND_JOINTS * 3),
        "jaw_pose": z(3),
        "leye_pose": z(3),
        "reye_pose": z(3),
        "expression": z(num_expr),
        "transl": z(3),
    }


def _flat(x: jnp.ndarray, last: int) -> jnp.ndarray:
    return x.reshape((-1, last))


def forward(model: SmplxModel, params: dict, *, flat_hand_mean: bool = True,
            apply_transl: bool = False) -> jnp.ndarray:
    """SMPL-X forward: params -> vertices (B, V, 3).

    All pose inputs are axis-angle, flattened per part as in the reference
    param dicts (renderer.py:245-272). Leading dims of each param are
    flattened to one batch axis.

    flat_hand_mean=False adds the dataset hand mean to the hand poses (the
    smplx package behavior the reference toggles per dataset,
    thuman.yaml:20 false / ted_speech.yaml:16 true).
    """
    B = int(np.prod(params["global_orient"].shape[:-1])) if params["global_orient"].ndim > 1 else 1
    go = params["global_orient"].reshape(B, 3)
    body = params["body_pose"].reshape(B, NUM_BODY_JOINTS * 3)
    betas = params["betas"].reshape(B, -1)
    lhand = params["left_hand_pose"].reshape(B, NUM_HAND_JOINTS * 3)
    rhand = params["right_hand_pose"].reshape(B, NUM_HAND_JOINTS * 3)
    jaw = params["jaw_pose"].reshape(B, 3)
    leye = params["leye_pose"].reshape(B, 3)
    reye = params["reye_pose"].reshape(B, 3)
    expr = params["expression"].reshape(B, -1)

    if not flat_hand_mean:
        lhand = lhand + model.left_hand_mean
        rhand = rhand + model.right_hand_mean

    # SMPLX canonical joint order: root, body(21), jaw, leye, reye, lhand(15), rhand(15)
    full_pose = jnp.concatenate([go, body, jaw, leye, reye, lhand, rhand], axis=-1)
    full_pose = full_pose.reshape(B, NUM_JOINTS, 3)

    verts = lbs(model, betas, expr, full_pose)
    if apply_transl and "transl" in params:
        verts = verts + params["transl"].reshape(B, 1, 3)
    return verts


def lbs(model: SmplxModel, betas: jnp.ndarray, expression: jnp.ndarray,
        full_pose_aa: jnp.ndarray) -> jnp.ndarray:
    """Linear blend skinning core. betas (B,Nb), expression (B,Ne),
    full_pose_aa (B, J, 3) -> vertices (B, V, 3)."""
    B = betas.shape[0]
    nb = betas.shape[-1]
    ne = expression.shape[-1]

    # 1. Shape + expression blend shapes.
    v_shaped = (
        model.v_template[None]
        + jnp.einsum("bl,vcl->bvc", betas, model.shapedirs[..., :nb], precision="highest")
        + jnp.einsum("bl,vcl->bvc", expression, model.exprdirs[..., :ne], precision="highest")
    )

    # 2. Joints from the regressor.
    joints = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped, precision="highest")  # (B, J, 3)

    # 3. Pose blend shapes.
    rot_mats = axis_angle_to_matrix(full_pose_aa)  # (B, J, 3, 3)
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, (J-1)*9)
    pose_offsets = jnp.matmul(pose_feature, model.posedirs,
                              precision="highest").reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # 4. Forward kinematics over the static tree (unrolled: 55 batched matmuls).
    parents = np.asarray(model.parents)
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])
    transforms_mat = jnp.concatenate(
        [
            jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1),
            jnp.broadcast_to(
                jnp.array([0.0, 0.0, 0.0, 1.0], rot_mats.dtype), (B, NUM_JOINTS, 1, 4)
            ),
        ],
        axis=-2,
    )  # (B, J, 4, 4)

    # fp32-accurate 4x4 chain: TPU's default bf16 matmul costs ~2.5e-3 vertex
    # error at rest pose (measured), unacceptable for geometry.
    chains = [transforms_mat[:, 0]]
    for j in range(1, NUM_JOINTS):
        chains.append(jnp.matmul(chains[parents[j]], transforms_mat[:, j],
                                 precision="highest"))
    transforms = jnp.stack(chains, axis=1)  # (B, J, 4, 4)

    # 5. Remove the rest-pose joint locations (relative transforms).
    joints_h = jnp.concatenate([joints, jnp.zeros((B, NUM_JOINTS, 1), joints.dtype)], axis=-1)
    rel = transforms.at[..., :3, 3].add(
        -jnp.einsum("bjxy,bjy->bjx", transforms, joints_h, precision="highest")[..., :3]
    )

    # 6. Skinning.
    T = jnp.einsum("vj,bjxy->bvxy", model.lbs_weights, rel, precision="highest")  # (B, V, 4, 4)
    verts = jnp.einsum("bvxy,bvy->bvx", T[..., :3, :3], v_posed, precision="highest") + T[..., :3, 3]
    return verts


def joints_from_verts(model: SmplxModel, verts_shaped: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("jv,bvc->bjc", model.J_regressor, verts_shaped, precision="highest")


# ---------------------------------------------------------------------------
# Loading / synthesis
# ---------------------------------------------------------------------------

def load_model(path: str, num_betas: int = 10, num_expr: int = 10,
               dtype=np.float32) -> SmplxModel:
    """Load the released SMPLX_NEUTRAL model (.npz or .pkl).

    Mirrors the smplx package's field layout: shapedirs[..., :300] are shape
    components (first `num_betas` used) and [..., 300:300+num_expr] are the
    expression components.
    """
    if os.path.isdir(path):
        for cand in ("SMPLX_NEUTRAL.npz", "SMPLX_NEUTRAL.pkl"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        import pickle
        with open(path, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
        data = {k: np.asarray(v) for k, v in raw.items() if not isinstance(v, str)}

    shapedirs_all = np.asarray(data["shapedirs"], dtype)
    if shapedirs_all.shape[-1] > 300:  # full release: 300 shape + 100 expr
        shapedirs = shapedirs_all[..., :num_betas]
        exprdirs = shapedirs_all[..., 300:300 + num_expr]
    else:
        shapedirs = shapedirs_all[..., :num_betas]
        exprdirs = shapedirs_all[..., num_betas:num_betas + num_expr]

    posedirs = np.asarray(data["posedirs"], dtype)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (P, V*3)

    parents = np.asarray(data["kintree_table"])[0].astype(np.int32)
    parents[0] = -1
    parents = parents[:NUM_JOINTS]

    return SmplxModel(
        v_template=jnp.asarray(data["v_template"], dtype),
        shapedirs=jnp.asarray(shapedirs),
        exprdirs=jnp.asarray(exprdirs),
        posedirs=jnp.asarray(posedirs[: (NUM_JOINTS - 1) * 9]),
        J_regressor=jnp.asarray(np.asarray(data["J_regressor"], dtype)[:NUM_JOINTS]),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(np.asarray(data["weights"], dtype)[:, :NUM_JOINTS]),
        left_hand_mean=jnp.asarray(np.asarray(data.get("hands_meanl", np.zeros(45)), dtype)),
        right_hand_mean=jnp.asarray(np.asarray(data.get("hands_meanr", np.zeros(45)), dtype)),
        faces=jnp.asarray(np.asarray(data["f"], np.int32)),
    )


def _grid_faces(rows: int, cols: int) -> np.ndarray:
    """Triangulated grid topology — a well-formed manifold-ish face list."""
    faces = []
    for r in range(rows - 1):
        for c in range(cols - 1):
            a = r * cols + c
            b = a + 1
            d = a + cols
            e = d + 1
            faces.append((a, b, d))
            faces.append((b, e, d))
    return np.asarray(faces, np.int32)


def synthetic_model(seed: int = 0, num_verts: int = SMPLX_NUM_VERTS,
                    num_betas: int = 10, num_expr: int = 10,
                    dtype=np.float32, num_faces: int = None) -> SmplxModel:
    """Structurally-faithful random SMPLX stand-in (for tests/bench without
    the proprietary asset). Human-ish proportions: verts in a ~[-1,1] tall
    ellipsoid, joints spread along the body, smooth LBS weights.
    """
    rng = np.random.RandomState(seed)
    # Vertex template: vertically-stretched blob.
    v = rng.randn(num_verts, 3).astype(dtype)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    v *= np.array([0.25, 0.8, 0.15], dtype)
    v += 0.02 * rng.randn(num_verts, 3).astype(dtype)

    # Kinematic tree: real SMPLX parent indices (public topology constants).
    parents = np.array([
        -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19, 15, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
        20, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
    ], np.int32)
    assert parents.shape[0] == NUM_JOINTS

    # Joint rest positions: roughly along the body height.
    jpos = 0.1 * rng.randn(NUM_JOINTS, 3).astype(dtype)
    jpos[:, 1] += np.linspace(-0.8, 0.8, NUM_JOINTS).astype(dtype)

    # J_regressor: softmax of negative distance to each joint (rows sum to 1).
    d2 = ((v[None] - jpos[:, None]) ** 2).sum(-1)  # (J, V)
    Jreg = np.exp(-d2 / 0.02)
    Jreg = (Jreg / np.clip(Jreg.sum(-1, keepdims=True), 1e-8, None)).astype(dtype)

    # LBS weights: same kernel transposed, sharper.
    W = np.exp(-d2.T / 0.05)
    W = (W / np.clip(W.sum(-1, keepdims=True), 1e-8, None)).astype(dtype)

    rows = int(np.floor(np.sqrt(num_verts)))
    cols = num_verts // rows
    faces = _grid_faces(rows, cols)
    if num_faces is not None:
        # match an exact topology count (e.g. the real SMPLX 20908 for
        # manifest dry-runs): trim, or pad by repeating early faces
        # (duplicate face centers are harmless for shape validation)
        if num_faces <= faces.shape[0]:
            faces = faces[:num_faces]
        else:
            reps = -(-num_faces // faces.shape[0])
            faces = np.tile(faces, (reps, 1))[:num_faces]

    return SmplxModel(
        v_template=jnp.asarray(v),
        shapedirs=jnp.asarray(0.01 * rng.randn(num_verts, 3, num_betas).astype(dtype)),
        exprdirs=jnp.asarray(0.003 * rng.randn(num_verts, 3, num_expr).astype(dtype)),
        posedirs=jnp.asarray(0.001 * rng.randn((NUM_JOINTS - 1) * 9, num_verts * 3).astype(dtype)),
        J_regressor=jnp.asarray(Jreg),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(W),
        left_hand_mean=jnp.zeros(45, dtype),
        right_hand_mean=jnp.zeros(45, dtype),
        faces=jnp.asarray(faces),
    )


def get_model(path: Optional[str] = None, **kw) -> SmplxModel:
    """Load the real model if a path exists, else the synthetic stand-in."""
    if path and os.path.exists(path):
        return load_model(path, **kw)
    return synthetic_model()
