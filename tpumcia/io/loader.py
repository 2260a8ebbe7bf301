"""Host-side prefetching batch loader.

Feeds device computations from a (possibly lazy) host data source with a
background thread pool: while the TPU processes batch i, batch i+1 is being
decoded/assembled on host — replacing the reference's fully sequential
read-one-extract-one loop (ipynb:358-364).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


def batched_indices(n: int, batch_size: int, *, drop_remainder: bool = False):
    """Yield [start, stop) index ranges."""
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, stop, batch_size):
        yield np.arange(i, min(i + batch_size, stop))


class PrefetchLoader:
    """Iterate ``fetch(idx) -> batch`` over index chunks with ``depth``
    batches prepared ahead by a background thread."""

    def __init__(
        self,
        fetch: Callable[[np.ndarray], object],
        n: int | None = None,
        batch_size: int | None = None,
        *,
        depth: int = 2,
        drop_remainder: bool = False,
        chunks: list[np.ndarray] | None = None,
    ):
        if chunks is None:
            if n is None or batch_size is None:
                raise ValueError("give either chunks or (n, batch_size)")
            chunks = list(
                batched_indices(n, batch_size, drop_remainder=drop_remainder)
            )
        self._fetch = fetch
        self._chunks = list(chunks)
        self._depth = depth

    @property
    def chunks(self) -> list[np.ndarray]:
        return self._chunks

    def __len__(self):
        return len(self._chunks)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        stop = object()

        def producer():
            try:
                for idx in self._chunks:
                    q.put(("ok", self._fetch(idx)))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(("err", e))
            finally:
                q.put(("end", stop))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            kind, item = q.get()
            if kind == "err":
                raise item
            if kind == "end":
                break
            yield item
