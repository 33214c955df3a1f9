"""IDOL dataset (stage-1 training on .npy scene caches).

Reads the reference's cache format (reference: src/datasets/dataset_idol.py):
a list of per-scene dicts stored across one or more .npy files
(allow_pickle), each scene referencing image files (or mp4 videos) plus
cameras and a 189-d packed smpl_param per view, split as
[scale 1 | transl 3 | global_orient 3 | body_pose 63 | betas 10 |
 lhand 45 | rhand 45 | jaw 3 | leye 3 | reye 3 | expression 10]
(dataset_idol.py:432-435). View sampling supports first_is_front +
better_range stratified selection (:246-274); __getitem__ swallows errors
and falls back to scene 0 (:542-550) — kept, it is load-bearing for the
reference's flaky caches.
"""

from __future__ import annotations

import os
import random

import numpy as np

from .containers import VideoBatch

SMPL_SPLIT = [1, 3, 3, 63, 10, 45, 45, 3, 3, 3, 10]
SMPL_KEYS = ["scale", "transl", "global_orient", "body_pose", "betas",
             "left_hand_pose", "right_hand_pose", "jaw_pose", "leye_pose",
             "reye_pose", "expression"]


def unpack_smpl_189(vec: np.ndarray) -> dict:
    vec = np.asarray(vec, np.float32).reshape(-1)
    out = {}
    ofs = 0
    for k, n in zip(SMPL_KEYS, SMPL_SPLIT):
        out[k] = vec[ofs: ofs + n]
        ofs += n
    out.pop("scale")
    return out


class AvatarDataset:
    def __init__(self, cfg, split: str = "train"):
        ds = cfg.dataset
        self.image_size = tuple(ds.image_size)
        self.n_views = int(ds.get("specific_observation_num", 8))
        self.first_is_front = bool(ds.get("first_is_front", True))
        self.better_range = bool(ds.get("better_range", True))
        self.batch_size = int(cfg.training.batch_size) if split == "train" else 1
        self.rng = random.Random(0)

        paths = ds.get(f"cache_path_{split}") or []
        self.scenes = []
        for p in paths:
            if not os.path.exists(str(p)):
                continue
            data = np.load(str(p), allow_pickle=True)
            items = data.tolist() if hasattr(data, "tolist") else list(data)
            if isinstance(items, dict):
                items = list(items.values())
            self.scenes.extend(items)
        if not self.scenes:
            raise FileNotFoundError(
                f"No IDOL cache entries for split {split!r} (paths: {paths}). "
                "Configure dataset.cache_path_* or use the synthetic dataset.")

    def __len__(self):
        return len(self.scenes)

    def _sample_views(self, n_avail):
        k = min(self.n_views, n_avail)
        if self.better_range:
            # stratified: one view per angular bin
            bins = np.array_split(np.arange(n_avail), k)
            views = [int(self.rng.choice(list(b))) for b in bins if len(b)]
        else:
            views = self.rng.sample(range(n_avail), k)
        if self.first_is_front:
            views = [0] + [v for v in views if v != 0][: k - 1]
        return views[:k]

    def _load_scene(self, scene, idx):
        from PIL import Image
        H, W = self.image_size

        img_paths = scene.get("img_paths") or scene.get("images") or []
        n_avail = len(img_paths)
        views = self._sample_views(n_avail)

        frames, smpls, Ks, Es = [], [], [], []
        for v in views:
            img = Image.open(img_paths[v]).convert("RGB").resize((W, H))
            frames.append(np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
            sp = scene["smpl_param"][v] if np.ndim(scene["smpl_param"]) > 1 \
                else scene["smpl_param"]
            smpls.append(unpack_smpl_189(sp))
            Ks.append(np.asarray(scene["intrinsic"][v]
                                 if np.ndim(scene["intrinsic"]) > 2
                                 else scene["intrinsic"], np.float32).reshape(3, 3))
            Es.append(np.asarray(scene["extrinsic"][v], np.float32).reshape(4, 4))

        def build(sel):
            video = np.stack([frames[j] for j in sel])[None]
            smpl = {k: np.stack([smpls[j][k] for j in sel])[None]
                    for k in smpls[0]}
            cam = {"intrinsic": np.stack([Ks[j] for j in sel])[None],
                   "extrinsic": np.stack([Es[j] for j in sel])[None]}
            return VideoBatch(video=video, smpl_parms=smpl, cam_parms=cam,
                              width=W, height=H)

        ref = build([0])
        test = build(list(range(1, len(views))))
        return ref, test, idx

    def __getitem__(self, idx):
        try:
            return self._load_scene(self.scenes[idx % len(self.scenes)], idx)
        except Exception as e:  # noqa: BLE001 — reference behavior (:542-550)
            print(f"[idol] scene {idx} failed ({type(e).__name__}: {e}); "
                  "falling back to scene 0")
            return self._load_scene(self.scenes[0], idx)

    def __iter__(self):
        order = list(range(len(self)))
        self.rng.shuffle(order)
        for i in order:
            yield self[i]
