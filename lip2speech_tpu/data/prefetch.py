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
    """Wrap a batch iterable; keep up to `depth` ready batches ahead.

    Consumers that stop early (e.g. a train loop breaking at max_updates on
    an ENDLESS stream) must call close() — otherwise the fill thread stays
    blocked on the full queue forever, pinning `depth`+1 decoded batches and
    the underlying dataset. close() is idempotent; the iterator also works
    as a context manager.
    """

    def __init__(self, iterable: Iterable, depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, args=(iterable,),
                                        daemon=True)
        self._thread.start()

    def _put_stop_aware(self, item) -> bool:
        """Blocking put that gives up once close() is called; True if put."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self, iterable):
        try:
            for item in iterable:
                if not self._put_stop_aware(item):
                    return
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            close = getattr(iterable, "close", None)
            if close is not None:  # run generator finalizers promptly
                try:
                    close()
                except BaseException:
                    pass
            # after close() nobody is reading — don't block on a full queue
            self._put_stop_aware(_SENTINEL)

    def close(self):
        """Stop the fill thread and release its buffered batches."""
        self._stop.set()
        try:  # unblock a put() stuck on the full queue
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self) -> "PrefetchIterator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

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
