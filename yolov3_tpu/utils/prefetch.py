"""Background host->device prefetching.

Overlaps host batch assembly + device_put with device compute: a daemon
thread pulls batches from the (multiprocess) reader iterator, applies the
staging transform (typically `shard_batch`), and keeps a small bounded
buffer of device-resident batches ahead of the training loop. The
reference's equivalent is tf.data's `.prefetch(reader_count)`
(reference/train.py:61,65).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, TypeVar

T = TypeVar("T")
_SENTINEL = object()


class DevicePrefetcher:
    """Iterate `source`, applying `stage` in a background thread.

    depth bounds device-memory use (depth batches staged ahead).
    Exceptions in the thread re-raise at the consuming `next()` call.
    """

    def __init__(self, source: Iterator, stage: Callable, depth: int = 2):
        self._source = source
        self._stage = stage
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            for item in self._source:
                if self._stopped.is_set():
                    return
                self._q.put(self._stage(item))
        except BaseException as e:  # surfaced to the consumer
            self._error = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item

    def stop(self) -> None:
        self._stopped.set()
        # unblock the producer if it is waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
