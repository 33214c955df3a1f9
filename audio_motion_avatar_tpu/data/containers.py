"""Batch containers.

JAX-pytree equivalent of the reference's VideoData dataclass
(reference: src/utils/data_utils.py:8-27): video (B,S,C,H,W), smpl_parms /
cam_parms dicts, optional cropped images / audio features / point clouds.
Registered as a pytree so whole batches move through jit/pjit boundaries.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


@jax.tree_util.register_pytree_node_class
class VideoBatch:
    def __init__(self, video, smpl_parms, cam_parms, width=None, height=None,
                 cropped_images=None, audio_features=None, pcd_points=None):
        self.video = video
        self.smpl_parms = smpl_parms
        self.cam_parms = cam_parms
        self.width = width
        self.height = height
        self.cropped_images = cropped_images
        self.audio_features = audio_features
        self.pcd_points = pcd_points

    def tree_flatten(self):
        children = (self.video, self.smpl_parms, self.cam_parms,
                    self.cropped_images, self.audio_features, self.pcd_points)
        aux = (self.width, self.height)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        video, smpl, cam, cropped, audio, pcd = children
        return cls(video, smpl, cam, aux[0], aux[1], cropped, audio, pcd)

    def __repr__(self):
        v = None if self.video is None else getattr(self.video, "shape", None)
        return f"VideoBatch(video={v}, keys={list(self.smpl_parms or {})})"


def _cat(leaves):
    if all(x is None for x in leaves):
        return None
    if any(x is None for x in leaves):
        raise ValueError("cannot collate: optional field present on only "
                         "some items")
    return np.concatenate(leaves, axis=0)


def collate_video_batches(batches):
    """Stack a list of B=1 VideoBatch items into one (B, ...) batch along
    axis 0 — the TPU analog of the reference collate_fns, which stack
    `cfg.training.batch_size` dataset items per step (reference:
    src/utils/data_utils.py:83-145, src/datasets/dataset_factory.py:109-137).
    """
    first = batches[0]
    return VideoBatch(
        video=_cat([b.video for b in batches]),
        smpl_parms={k: _cat([b.smpl_parms[k] for b in batches])
                    for k in first.smpl_parms},
        cam_parms={k: _cat([b.cam_parms[k] for b in batches])
                   for k in first.cam_parms},
        width=first.width, height=first.height,
        cropped_images=_cat([b.cropped_images for b in batches]),
        audio_features=_cat([b.audio_features for b in batches]),
        pcd_points=_cat([b.pcd_points for b in batches]),
    )


class CollatedBatches:
    """Groups `batch_size` consecutive (ref, target, idx) items from a
    B=1-yielding dataset into (B, ...) batches. batch_id is the FIRST
    item's id, matching the reference collate (data_utils.py:143
    `batch_id = batch[0]['batch_id']`). The trailing partial group is
    dropped: a variable trailing batch dim would retrigger XLA compilation
    (static shapes); the reference DataLoader keeps it, which on TPU would
    cost a full recompile for one step."""

    def __init__(self, dataset, batch_size: int):
        self.dataset = dataset
        self.batch_size = int(batch_size)

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        buf = []
        for item in self.dataset:
            buf.append(item)
            if len(buf) == self.batch_size:
                refs, tgts, ids = zip(*buf)
                yield (collate_video_batches(refs),
                       collate_video_batches(tgts), ids[0])
                buf = []
