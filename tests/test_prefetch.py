"""Host-side async data pipeline (data/prefetch.py).

Covers the round-3 VERDICT missing item #1: worker-thread decode +
double-buffered batch prefetch (llava_train_sp.py:705-708 DataLoader
workers analog) and exact data-order resume (xtuner tools/train.py:217-242
seed/iter resume semantics).
"""

import threading
import time

import numpy as np
import pytest

from aurora_tpu.data.prefetch import BatchPrefetcher, index_stream
from aurora_tpu.data.sampler import (LengthGroupedSampler, ParallelSampler,
                                     batched)


def _collate(samples):
    return np.stack(samples)


def test_prefetcher_matches_serial_order():
    data = {i: np.full((3,), i) for i in range(40)}
    idx_batches = [list(range(i, i + 4)) for i in range(0, 40, 4)]
    with BatchPrefetcher(iter(idx_batches), data.__getitem__, _collate,
                         depth=3, workers=4) as pf:
        got = list(pf)
    want = [_collate([data[i] for i in b]) for b in idx_batches]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_prefetcher_overlaps_fetches():
    """Per-sample fetches of one batch run concurrently on the pool."""
    peak = [0]
    cur = [0]
    lock = threading.Lock()

    def fetch(i):
        with lock:
            cur[0] += 1
            peak[0] = max(peak[0], cur[0])
        time.sleep(0.05)
        with lock:
            cur[0] -= 1
        return i

    batches = [list(range(8))]
    with BatchPrefetcher(iter(batches), fetch, list, depth=1,
                         workers=4) as pf:
        assert next(pf) == list(range(8))
    assert peak[0] > 1, "fetches never overlapped"


def test_prefetcher_pipelines_ahead():
    """While the consumer holds batch k, batch k+1 is being built."""
    started = []

    def fetch(i):
        started.append(i)
        return i

    batches = [[0], [1], [2], [3]]
    pf = BatchPrefetcher(iter(batches), fetch, list, depth=2, workers=1)
    first = next(pf)
    assert first == [0]
    deadline = time.time() + 5
    while 1 not in started and time.time() < deadline:
        time.sleep(0.01)
    assert 1 in started, "no prefetch beyond the consumed batch"
    pf.close()


def test_prefetcher_propagates_exceptions():
    def fetch(i):
        if i == 5:
            raise ValueError("boom")
        return i

    pf = BatchPrefetcher(iter([[1, 2], [5, 6]]), fetch, list,
                         depth=2, workers=2)
    assert next(pf) == [1, 2]
    with pytest.raises(ValueError, match="boom"):
        next(pf)
    pf.close()


def test_index_stream_resume_matches_uninterrupted():
    """A run resumed at step k consumes exactly the batches the
    uninterrupted run would have consumed from step k on — across an
    epoch boundary (the round-3 weak item: resume restarted at batch 0)."""
    sampler = LengthGroupedSampler(list(np.random.default_rng(0)
                                        .integers(1, 100, 23)),
                                   batch_size=4, seed=7)
    full = [b for _, b in zip(range(14), index_stream(sampler, 4))]
    for k in (1, 3, 5, 8, 11):   # 23//4 = 5 batches/epoch → crosses epochs
        resumed = [b for _, b in zip(range(14 - k),
                                     index_stream(sampler, 4,
                                                  start_step=k))]
        assert resumed == full[k:], f"resume mismatch at step {k}"


def test_index_stream_epochs_reshuffle():
    sampler = ParallelSampler(16, seed=3)
    stream = index_stream(sampler, 4)
    epoch0 = [next(stream) for _ in range(4)]
    epoch1 = [next(stream) for _ in range(4)]
    flat0 = [i for b in epoch0 for i in b]
    flat1 = [i for b in epoch1 for i in b]
    assert sorted(flat0) == sorted(flat1) == list(range(16))
    assert flat0 != flat1, "epochs must reshuffle (set_epoch)"


def test_set_epoch_deterministic():
    # mega_batch_mult=1 → megabatch of 2: the shuffle (and thus the
    # epoch seed) decides which indices land together before the sort
    s = LengthGroupedSampler([5, 3, 9, 1, 7, 2, 8, 4], batch_size=2,
                             mega_batch_mult=1, seed=0)
    s.set_epoch(2)
    a = list(iter(s))
    s.set_epoch(2)
    assert list(iter(s)) == a
    s.set_epoch(3)
    assert list(iter(s)) != a


def test_batched_drop_last_matches_len():
    """index_stream's batches-per-epoch bookkeeping (len//bs) must agree
    with batched(drop_last=True) — resume arithmetic depends on it."""
    for n, bs in [(23, 4), (16, 4), (7, 3), (5, 8)]:
        sampler = ParallelSampler(n, seed=0, shuffle=False)
        got = len(list(batched(iter(sampler), bs)))
        assert got == n // bs
