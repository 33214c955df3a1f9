"""Dataset prefetching over the native C++ ring (native/prefetch.cpp).

Wraps any indexable dataset in a background-producer pipeline so host-side
decode (PNG/JSON/audio) overlaps the device step. Falls back to a
thread-based pure-Python pipeline when the shared library isn't built
(`sh native/build.sh`).

ctypes binding notes: producer callbacks run on C++ worker threads; ctypes
re-acquires the GIL around the Python callback automatically. Items are
exchanged as integer tokens into a Python-side registry, so no Python
object crosses the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from typing import Iterator, Optional

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libamatprefetch.so")

_PRODUCER = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p)


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                ctypes.c_uint64, _PRODUCER, ctypes.c_void_p]
    lib.ring_pop.restype = ctypes.c_uint64
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.ring_stop.argtypes = [ctypes.c_void_p]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_size.restype = ctypes.c_uint64
    lib.ring_size.argtypes = [ctypes.c_void_p]
    return lib


class NativePrefetcher:
    """Iterate `dataset` with `num_workers` C++ threads producing ahead,
    bounded by `capacity`. Yields items in completion order (the reference's
    shuffled training consumption is order-insensitive)."""

    def __init__(self, dataset, num_workers: int = 2, capacity: int = 4):
        self.dataset = dataset
        self.num_workers = num_workers
        self.capacity = capacity
        self.lib = _load_lib()

    def __len__(self):
        return len(self.dataset)

    def __iter__(self) -> Iterator:
        if self.lib is None:
            yield from self._python_fallback()
            return

        registry = {}
        reg_lock = threading.Lock()
        counter = [1]

        @_PRODUCER
        def produce(index, _ctx):
            item = self.dataset[int(index)]
            with reg_lock:
                token = counter[0]
                counter[0] += 1
                registry[token] = item
            return token

        n = len(self.dataset)
        ring = self.lib.ring_create(n, self.capacity, self.num_workers,
                                    produce, None)
        try:
            for _ in range(n):
                idx = ctypes.c_uint64()
                token = self.lib.ring_pop(ring, ctypes.byref(idx))
                if token == ctypes.c_uint64(-1).value:
                    break
                with reg_lock:
                    item = registry.pop(token)
                yield item
        finally:
            self.lib.ring_destroy(ring)

    def _python_fallback(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.capacity)
        n = len(self.dataset)
        SENTINEL = object()

        def worker(worker_id):
            for i in range(worker_id, n, self.num_workers):
                q.put(self.dataset[i])
            q.put(SENTINEL)

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        done = 0
        while done < self.num_workers:
            item = q.get()
            if item is SENTINEL:
                done += 1
                continue
            yield item


def maybe_prefetch(dataset, num_workers: int = 0, capacity: int = 4):
    """num_workers=0 -> the dataset itself (the reference default,
    dataset_factory num_workers=0)."""
    if num_workers <= 0:
        return dataset
    return NativePrefetcher(dataset, num_workers, capacity)
