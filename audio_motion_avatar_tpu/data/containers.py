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
