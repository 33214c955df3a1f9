"""Synthetic dataset — structurally identical batches without any assets.

Produces the same (ref_batch, target_batch, batch_id) triples the reference
collate fns emit (reference: src/utils/data_utils.py:83-145 speech,
:330-391 thuman), with plausible cameras orbiting a synthetic body. Used by
unit tests, the overfit integration test, bench.py and the demo path when no
real dataset is mounted.
"""

from __future__ import annotations

import numpy as np

from ..ops import smplx as smplx_ops
from .containers import VideoBatch


def orbit_camera(angle: float, dist: float = 2.5, height: float = 0.0,
                 focal: float = 600.0, image_size=(512, 512)):
    """OpenCV world->camera extrinsic orbiting the origin + intrinsics."""
    H, W = image_size
    c, s = np.cos(angle), np.sin(angle)
    eye = np.array([dist * s, height, -dist * c], np.float64)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    R = np.stack([right, dn, fwd], 0)
    t = -R @ eye
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = t
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    return K, E


def random_smpl_params(rng: np.random.RandomState, shape, pose_scale=0.2,
                       num_expr=10):
    def r(*dims):
        return (rng.randn(*shape, *dims) * pose_scale).astype(np.float32)

    return {
        "global_orient": r(3) * 0.3,
        "body_pose": r(smplx_ops.NUM_BODY_JOINTS * 3),
        "betas": (rng.randn(*shape, 10) * 0.3).astype(np.float32),
        "left_hand_pose": r(smplx_ops.NUM_HAND_JOINTS * 3),
        "right_hand_pose": r(smplx_ops.NUM_HAND_JOINTS * 3),
        "jaw_pose": r(3) * 0.2,
        "leye_pose": r(3) * 0.1,
        "reye_pose": r(3) * 0.1,
        "expression": (rng.randn(*shape, num_expr) * 0.3).astype(np.float32),
        "transl": np.tile(np.array([0, 0.0, 0], np.float32), (*shape, 1)),
    }


def make_batch(batch_size=1, num_frames=2, image_size=(64, 64), seed=0,
               num_expr=10, with_audio=False, audio_dim=768,
               audio_frames=None):
    """One (B, T) batch: random body pose, orbiting cameras, noise video."""
    rng = np.random.RandomState(seed)
    H, W = image_size
    B, T = batch_size, num_frames
    Ks, Es = [], []
    for b in range(B):
        for t in range(T):
            K, E = orbit_camera(angle=0.3 * t + 0.1 * b, image_size=image_size,
                                focal=max(H, W) * 1.2)
            Ks.append(K)
            Es.append(E)
    cam = {
        "intrinsic": np.stack(Ks).reshape(B, T, 3, 3),
        "extrinsic": np.stack(Es).reshape(B, T, 4, 4),
    }
    video = rng.rand(B, T, 3, H, W).astype(np.float32)
    smpl = random_smpl_params(rng, (B, T), num_expr=num_expr)
    audio = None
    if with_audio:
        af = audio_frames or num_frames
        audio = rng.randn(B, af, audio_dim).astype(np.float32)
    return VideoBatch(video=video, smpl_parms=smpl, cam_parms=cam,
                      width=W, height=H, audio_features=audio)


def render_gt_video(smplx_model, batch, image_size):
    """Replace a batch's noise video with a FITTABLE splat-rendered target:
    a fixed Gaussian body (verts posed from the batch's own SMPLX params,
    smooth dark positional colors — far-from-white so visibility is
    strictly loss-reducing, the round-4 collapse lesson) rendered from the
    batch's own cameras. Returns (B, T, 3, H, W) float32."""
    import jax
    import jax.numpy as jnp

    from ..ops import smplx as smplx_ops
    from ..ops.splat import render_batch

    H, W = image_size
    B, T = batch.cam_parms["extrinsic"].shape[:2]
    verts = smplx_ops.forward(
        smplx_model, {k: jnp.asarray(v) for k, v in batch.smpl_parms.items()})
    verts = verts.reshape(B, T, -1, 3)
    N = verts.shape[2]
    v0 = verts[0, 0]
    colors = 0.32 + 0.28 * jnp.sin(v0 * jnp.asarray([9.0, 7.0, 11.0]) +
                                   jnp.asarray([0.0, 2.1, 4.2]))
    gaussians = {
        "xyz": verts,
        "rot": jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (B, T, N, 4)),
        # activate_scales: min(exp(s-3.9), 0.1); raw for ~2.5% of body size
        "scale": jnp.full((B, T, N, 3), np.log(0.025) + 3.9),
        "opacity": jnp.full((B, T, N), 4.0),
        "color": jnp.broadcast_to(colors, (B, T, N, 3)),
    }
    imgs = render_batch(gaussians, jnp.asarray(batch.cam_parms["intrinsic"]),
                        jnp.asarray(batch.cam_parms["extrinsic"]), W, H)
    return np.transpose(np.asarray(imgs), (0, 1, 4, 2, 3)).astype(np.float32)


class SyntheticDataset:
    """Iterable dataset yielding (ref_batch, target_batch, batch_id)."""

    def __init__(self, length=8, batch_size=1, ref_frames=2, target_frames=6,
                 image_size=(64, 64), with_audio=False, audio_dim=768, seed=0,
                 render_gt=False):
        self.length = length
        self.kw = dict(batch_size=batch_size, image_size=image_size)
        self.ref_frames = ref_frames
        self.target_frames = target_frames
        self.with_audio = with_audio
        self.audio_dim = audio_dim
        self.seed = seed
        # render_gt: splat-render a reachable body target instead of noise
        # video, so tiny-profile training is SEMANTIC (losses fall toward a
        # renderable image, golden fixtures pin learned output). The body is
        # a small synthetic SMPLX (400 verts) — a fit target only; the
        # model's own body resolution is independent.
        self.render_gt = bool(render_gt)
        self._smplx = None

    def __len__(self):
        return self.length

    def _gt(self, batch):
        if self._smplx is None:
            from ..ops import smplx as smplx_ops
            self._smplx = smplx_ops.synthetic_model(seed=0, num_verts=400)
        return render_gt_video(self._smplx, batch,
                               self.kw["image_size"])

    def __getitem__(self, i):
        ref = make_batch(num_frames=self.ref_frames, seed=self.seed + i, **self.kw)
        tgt = make_batch(num_frames=self.target_frames, seed=self.seed + 1000 + i,
                         with_audio=self.with_audio, audio_dim=self.audio_dim,
                         **self.kw)
        if self.render_gt:
            ref.video = self._gt(ref)
            tgt.video = self._gt(tgt)
        return ref, tgt, i

    def __iter__(self):
        for i in range(self.length):
            yield self[i]
