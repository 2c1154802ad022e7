"""Prefetching data loader (data/loader.py)."""

import time

import numpy as np
import pytest

from modelcompose_tpu.data.loader import PrefetchLoader


class SlowDataset:
    def __init__(self, n, delay=0.005):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        return i


def collate(samples):
    return list(samples)


def test_order_preserved_with_workers():
    ds = SlowDataset(40, delay=0.001)
    order = list(range(40))
    loader = PrefetchLoader(ds, order, batch_size=4, collate=collate,
                            num_workers=4, prefetch=2)
    batches = list(loader)
    assert len(batches) == 10
    assert batches[0] == [0, 1, 2, 3]
    assert [b for batch in batches for b in batch] == order


def test_synchronous_mode():
    ds = SlowDataset(8, delay=0)
    loader = PrefetchLoader(ds, list(range(8)), 4, collate, num_workers=0)
    assert list(loader) == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_drops_trailing_partial_batch():
    ds = SlowDataset(10, delay=0)
    loader = PrefetchLoader(ds, list(range(10)), 4, collate, num_workers=2)
    assert len(loader) == 2


def test_worker_exception_propagates():
    class Bad(SlowDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return i

    loader = PrefetchLoader(Bad(8, 0), list(range(8)), 4, collate,
                            num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(loader)


def test_workers_overlap_decode():
    ds = SlowDataset(32, delay=0.01)  # 0.32 s serial decode
    order = list(range(32))
    t0 = time.perf_counter()
    list(PrefetchLoader(ds, order, 4, collate, num_workers=8, prefetch=4))
    parallel_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    list(PrefetchLoader(ds, order, 4, collate, num_workers=0))
    serial_time = time.perf_counter() - t0
    assert parallel_time < serial_time * 0.7


def test_early_exit_releases_threads():
    """Breaking out of iteration must not leak parked workers/emitter
    threads or deadlock (generator close path)."""
    import threading
    before = threading.active_count()
    ds = SlowDataset(64, delay=0.001)
    loader = PrefetchLoader(ds, list(range(64)), 4, collate,
                            num_workers=4, prefetch=2)
    for epoch in range(3):  # repeated partial epochs
        for i, _ in enumerate(loader):
            if i == 1:
                break  # generator close -> finally shuts the pool down
    deadline = time.perf_counter() + 5.0
    while threading.active_count() > before and time.perf_counter() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"leaked {threading.active_count() - before} threads")


def test_prefetch_zero_stays_bounded():
    """prefetch=0 must not become an UNBOUNDED queue (queue.Queue treats
    maxsize=0 as infinite): with a stalled consumer, decode look-ahead
    stays within the window instead of racing through the epoch."""

    class CountingDataset(SlowDataset):
        def __init__(self, n):
            super().__init__(n, delay=0.0)
            self.decoded = 0

        def __getitem__(self, i):
            self.decoded += 1
            return super().__getitem__(i)

    ds = CountingDataset(80)
    loader = PrefetchLoader(ds, list(range(80)), 2, collate,
                            num_workers=2, prefetch=0)
    it = iter(loader)
    next(it)
    next(it)
    time.sleep(0.3)  # stalled consumer; workers must back-pressure
    # window = max(prefetch,1) + num_workers = 3, out_q holds 1, plus the
    # 2 consumed batches and in-flight slack: far below the 40 batches a
    # runaway loader would decode.
    assert ds.decoded <= 2 * (2 + 3 + 1 + 2), ds.decoded
    it.close()
