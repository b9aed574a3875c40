"""Host-side async data pipeline: worker-thread decode + batch prefetch.

Parity: the reference feeds GPUs through torch DataLoader worker processes
(src/xtuner_lite/llava_train_sp.py:705-708 — `num_workers=4,
persistent_workers=True`); SURVEY §7 design decision 5 calls for "PyAV
decode on host workers → device prefetch". This is the TPU-native
equivalent, with two deliberate differences:

  * THREADS, not processes. The heavy host ops (PyAV/PIL decode, numpy
    resize/normalize) release the GIL, and every forked Python process on
    this platform re-runs the sitecustomize TPU claim — process workers
    would fight the training process for the chip. Threads share the
    device handle and copy nothing.
  * H2D happens ON the worker. JAX dispatch is async: `jnp.asarray` /
    `device_put` issued from the assembly thread overlaps the transfer
    with the step the device is already running, so `next()` hands the
    train loop a batch whose transfer is in flight (double-buffering).

Shape: a bounded pipeline of `depth` in-flight batches; each batch fans
its per-sample `fetch` calls out over a `workers`-thread pool, then a
per-batch assembly thread runs `collate` (pad/pack/stack + H2D).
Exceptions surface on `next()`; `close()` tears the pools down.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Sequence


class BatchPrefetcher:
    """Async pipeline: index batches → fetched samples → collated batch.

    index_iter : iterator of index lists (finite or infinite)
    fetch      : per-sample loader, runs on the worker pool (idx → sample)
    collate    : batch assembler, runs on the assembly pool
                 (list[sample] → device-ready batch)
    depth      : in-flight batches (2 = classic double buffering)
    workers    : per-sample decode threads shared by all in-flight batches
    """

    def __init__(self, index_iter: Iterable[Sequence[int]],
                 fetch: Callable, collate: Callable,
                 depth: int = 2, workers: int = 2):
        assert depth >= 1 and workers >= 1
        self._it = iter(index_iter)
        self._fetch = fetch
        self._collate = collate
        self._samples = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="aurora-sample")
        self._batches = ThreadPoolExecutor(
            max_workers=depth, thread_name_prefix="aurora-batch")
        self._q: deque = deque()
        self._closed = False
        for _ in range(depth):
            self._enqueue()

    def _assemble(self, idxs):
        samples = list(self._samples.map(self._fetch, idxs))
        return self._collate(samples)

    def _enqueue(self) -> None:
        if self._closed:
            return
        try:
            idxs = next(self._it)
        except StopIteration:
            return
        self._q.append(self._batches.submit(self._assemble, idxs))

    def __iter__(self) -> "BatchPrefetcher":
        return self

    def __next__(self):
        if not self._q:
            raise StopIteration
        fut = self._q.popleft()
        self._enqueue()          # keep the pipeline full
        return fut.result()

    def close(self) -> None:
        self._closed = True
        for f in self._q:
            f.cancel()
        self._q.clear()
        self._samples.shutdown(wait=False)
        self._batches.shutdown(wait=False)

    def __enter__(self) -> "BatchPrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def index_stream(sampler, batch_size: int,
                 start_step: int = 0) -> Iterator[List[int]]:
    """Infinite, RESUMABLE stream of index batches over epoch re-iterations.

    Epochs reshuffle deterministically via `sampler.set_epoch(e)` (torch
    DistributedSampler semantics — the reference restores the sampler seed
    and iter position on resume, src/xtuner/xtuner/tools/train.py:217-242).
    Resuming at `start_step` fast-forwards: epoch = step // batches_per_epoch
    and the first `step % batches_per_epoch` batches of that epoch are
    skipped, so step N+1 of a resumed run consumes exactly the batch an
    uninterrupted run would have.
    """
    from aurora_tpu.data.sampler import batched
    bpe = len(sampler) // batch_size
    if bpe < 1:
        raise ValueError(
            f"dataset yields {len(sampler)} samples per rank < batch_size "
            f"{batch_size}: no full batch exists (drop_last semantics)")
    epoch, skip = divmod(max(0, start_step), bpe)
    while True:
        if hasattr(sampler, "set_epoch"):
            sampler.set_epoch(epoch)
        for k, idxs in enumerate(batched(iter(sampler), batch_size)):
            if k < skip:
                continue
            yield idxs
        skip = 0
        epoch += 1
