"""Host->device input pipeline: background batch preparation + transfer.

The reference relies on torch DataLoader worker processes
(train_maskplanner.py:134-148). Here a single background thread runs item
materialization + collate + ``device_put`` one batch ahead of the train
step, so the host pipeline and the tunnel transfer overlap with device
compute. Depth-1 double buffering is enough: the consumer blocks only
when compute is faster than the host side.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator


class Prefetcher:
    def __init__(self, loader, mesh=None, depth: int = 2):
        self.loader = loader
        self.mesh = mesh
        self.depth = depth

    def epoch(self, epoch: int) -> Iterator:
        from ..parallel import shard_batch

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error: list[BaseException] = []

        def producer():
            try:
                for batch in self.loader.epoch(epoch):
                    if self.mesh is not None:
                        batch = shard_batch(batch, self.mesh)
                    q.put(batch)
            except BaseException as exc:  # propagate to consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]

    def __len__(self):
        return len(self.loader)
