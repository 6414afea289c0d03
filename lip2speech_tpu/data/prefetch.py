"""Host-side data-loader parallelism.

The reference uses fairseq's worker processes (num_workers: 3,
conf/lrs3/multi_target.yaml) and multiprocessing Pools. Here the device is
fed by a bounded background-thread prefetcher: batches are built on worker
threads while the TPU executes the previous step (the host->device pipeline
pattern; numpy releases the GIL for the heavy IO/decode work).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


class PrefetchIterator:
    """Wrap a batch iterable; keep up to `depth` ready batches ahead."""

    def __init__(self, iterable: Iterable, depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._fill, args=(iterable,),
                                        daemon=True)
        self._thread.start()

    def _fill(self, iterable):
        try:
            for item in iterable:
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable, depth: int = 3) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth)


class ParallelMap:
    """Unordered parallel map over indices with worker threads — the
    create_dataset.py multiprocessing-Pool equivalent for prep jobs."""

    def __init__(self, fn: Callable, n_workers: int = 3):
        self.fn = fn
        self.n_workers = n_workers

    def __call__(self, items: list) -> list:
        results = [None] * len(items)
        it = iter(range(len(items)))
        lock = threading.Lock()
        errors: list[BaseException] = []

        def worker():
            while True:
                with lock:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                try:
                    results[i] = self.fn(items[i])
                except BaseException as e:
                    errors.append(e)
                    return

        threads = [threading.Thread(target=worker) for _ in range(self.n_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        return results
