"""Dataset factory.

Type-switch + loader construction equivalent to the reference DatasetFactory
(reference: src/datasets/dataset_factory.py:36-137): train split uses
training.batch_size + shuffle, eval splits use batch 1.
"""

from __future__ import annotations

from .synthetic import SyntheticDataset


class DatasetFactory:
    @staticmethod
    def create_dataset(cfg, split: str = "train"):
        dtype = cfg.dataset.get("type", "SyntheticDataset")
        if dtype == "SyntheticDataset":
            ds_cfg = cfg.dataset
            return SyntheticDataset(
                length=int(ds_cfg.get("length", 8)),
                batch_size=int(cfg.training.batch_size) if split == "train" else 1,
                ref_frames=int(ds_cfg.get("ref_frames", 2)),
                target_frames=int(ds_cfg.get("target_frames", 6)),
                image_size=tuple(ds_cfg.image_size),
                # the synthetic stand-in serves BOTH stages; stage-2
                # entries (main2 train/test) require audio features on
                # every batch, stage 1 simply ignores them
                with_audio=True,
                audio_dim=int(ds_cfg.get("audio_feature_dim", 768)),
                seed=0 if split == "train" else 10_000,
                render_gt=bool(ds_cfg.get("render_gt", False)),
            )
        if dtype == "ThumanDataset":
            from .thuman import ThumanDataset
            return ThumanDataset(cfg, split)
        if dtype == "IDOLDataset":
            from .idol import AvatarDataset
            return AvatarDataset(cfg, split)
        if dtype == "GaussianAudioDataset":
            from .speech import GaussianAudioDataset
            return GaussianAudioDataset(cfg, split)
        raise ValueError(f"Unknown dataset type: {dtype}")

    @staticmethod
    def create_dataloader(cfg, split: str = "train"):
        """Datasets here ARE iterables of collated (ref, target, id) batches.
        training.dataloader.num_workers > 0 wraps them in the native C++
        prefetch ring (data/prefetch.py) so host decode overlaps device
        steps."""
        ds = DatasetFactory.create_dataset(cfg, split)
        # Real datasets yield B=1 items; collate training.batch_size of
        # them per step like the reference collate_fns
        # (dataset_factory.py:109-137). The synthetic dataset batches
        # internally (factory passes batch_size into its ctor).
        bs = int(cfg.training.batch_size) if split == "train" else 1
        if bs > 1 and not isinstance(ds, SyntheticDataset):
            from .containers import CollatedBatches
            ds = CollatedBatches(ds, bs)
        workers = int(cfg.training.get("dataloader", {}).get("num_workers", 0)) \
            if split == "train" else 0
        from .prefetch import maybe_prefetch
        return maybe_prefetch(ds, workers)
