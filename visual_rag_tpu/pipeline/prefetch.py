"""Host-side prefetch: overlap image preprocessing with device embedding.

TPU-native equivalent of the reference's torch DataLoader input parallelism
(`--loader-workers`, prefetch_factor, persistent_workers —
run_qdrant.py:330-436, SURVEY §2.5): a bounded thread pool runs
crop + patchification AHEAD of the device embed loop, so the accelerator never
waits on PIL/numpy work.
"""

from __future__ import annotations

import concurrent.futures
import logging
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

logger = logging.getLogger(__name__)


class HostPrefetcher:
    """Maps ``fn`` over items on worker threads with a bounded lookahead.

    Results arrive IN ORDER. Exceptions propagate at the corresponding
    position (wrapped as the result), so one bad page doesn't kill the run —
    mirroring the reference's per-doc isolation semantics.
    """

    def __init__(self, fn: Callable[[Any], Any], workers: int = 4, lookahead: int = 8):
        self.fn = fn
        self.workers = max(1, int(workers))
        self.lookahead = max(1, int(lookahead))

    def __call__(self, items: Iterable[Any]) -> Iterator[Any]:
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=self.workers)
        pending: "queue.Queue[concurrent.futures.Future]" = queue.Queue()
        stop = threading.Event()

        def submitter():
            try:
                for item in items:
                    if stop.is_set():
                        return
                    while pending.qsize() >= self.lookahead and not stop.is_set():
                        stop.wait(0.005)
                    pending.put(pool.submit(self._safe, item))
            finally:
                pending.put(None)  # end-of-stream sentinel

        t = threading.Thread(target=submitter, daemon=True)
        t.start()
        try:
            while True:
                fut = pending.get()
                if fut is None:
                    break
                yield fut.result()
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)

    def _safe(self, item):
        try:
            return self.fn(item)
        except Exception as exc:  # surfaced in-order; caller decides
            return PrefetchError(item, exc)


class PrefetchError:
    """In-order marker for an item whose preprocessing failed."""

    def __init__(self, item, error: Exception):
        self.item = item
        self.error = error

    def __repr__(self):
        return f"PrefetchError({self.error!r})"


def prefetched_batches(items, batch_size: int, prepare: Callable[[Any], Any],
                       workers: int = 4, lookahead: Optional[int] = None):
    """Yield (prepared_batch, errors) with preprocessing overlapped.

    ``prepare`` runs on worker threads; batches of successfully prepared items
    are yielded alongside the PrefetchErrors from that window.
    """
    fetcher = HostPrefetcher(
        prepare, workers=workers, lookahead=lookahead or batch_size * 2)
    batch, errors = [], []
    for out in fetcher(items):
        if isinstance(out, PrefetchError):
            errors.append(out)
        else:
            batch.append(out)
        if len(batch) >= batch_size:
            yield batch, errors
            batch, errors = [], []
    if batch or errors:
        yield batch, errors
