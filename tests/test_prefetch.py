"""Native C++ prefetch ring + python fallback."""
import os
import time

import pytest

from audio_motion_avatar_tpu.data.prefetch import (NativePrefetcher,
                                                   maybe_prefetch, _load_lib)


class SlowDataset:
    def __init__(self, n=16, delay=0.01):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        return i * 10


def test_native_lib_builds_and_loads():
    assert _load_lib() is not None, "run sh native/build.sh"


def test_prefetch_yields_all_items():
    ds = SlowDataset(16)
    pf = NativePrefetcher(ds, num_workers=4, capacity=4)
    items = sorted(pf)
    assert items == [i * 10 for i in range(16)]


def test_prefetch_overlaps_work():
    """4 workers on a 10ms-per-item dataset must beat serial by ~2x+."""
    ds = SlowDataset(24, delay=0.01)
    t0 = time.time()
    _ = [ds[i] for i in range(len(ds))]
    serial = time.time() - t0

    pf = NativePrefetcher(ds, num_workers=4, capacity=8)
    t0 = time.time()
    items = list(pf)
    parallel = time.time() - t0
    assert len(items) == 24
    assert parallel < serial * 0.7, (serial, parallel)


def test_python_fallback():
    ds = SlowDataset(8)
    pf = NativePrefetcher(ds, num_workers=2, capacity=2)
    pf.lib = None  # force fallback
    assert sorted(pf) == [i * 10 for i in range(8)]


def test_maybe_prefetch_zero_workers():
    ds = SlowDataset(4)
    assert maybe_prefetch(ds, 0) is ds
