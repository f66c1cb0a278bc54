"""Background-thread batch prefetcher.

The reference overlaps host preprocessing with device compute via torch
DataLoader workers (train.py:368-376). Here a small thread pool drains the
batch source ahead of the training loop so VAE/text encode + host image work
overlap the (async-dispatched) device step. Bounded queue -> bounded memory.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional


class Prefetcher:
    """Wrap an iterable of batches with N worker threads and a bounded queue.

    map_fn (optional) runs inside the workers — put host-side preprocessing
    (decode/resize/normalize, e.g. data/native.py calls) there.
    """

    _DONE = object()

    def __init__(self, source: Iterable, *, depth: int = 4, workers: int = 1,
                 map_fn: Optional[Callable[[Any], Any]] = None):
        self._source = iter(source)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._map = map_fn or (lambda x: x)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = [threading.Thread(target=self._work, daemon=True)
                         for _ in range(workers)]
        self._live = len(self._threads)
        for t in self._threads:
            t.start()

    def _next_item(self):
        with self._lock:
            return next(self._source)

    def _work(self):
        while not self._stop.is_set():
            try:
                item = self._next_item()
            except StopIteration:
                break
            except Exception as e:  # surface errors to the consumer
                self._q.put(e)
                break
            try:
                self._q.put(self._map(item))
            except Exception as e:
                self._q.put(e)
                break
        with self._lock:
            self._live -= 1
            if self._live == 0:
                self._q.put(self._DONE)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
