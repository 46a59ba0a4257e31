"""Host->device prefetching.

The reference's input pipeline is a synchronous Python generator feeding
feed_dicts (SURVEY.md section 2.4: "Data pipeline parallelism: none").
Here a background thread assembles host batches and eagerly `device_put`s
them (optionally with an explicit sharding) so the accelerator never waits
on the host: while step N runs, batch N+1..N+depth are already in HBM.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


_SENTINEL = object()


def prefetch_to_device(batches: Iterable, depth: int = 2,
                       sharding=None, place_fn=None) -> Iterator:
    """Wrap a host batch iterator with an async device-transfer pipeline.

    `place_fn` overrides the device placement (e.g. per-item shardings
    when the iterator yields a mix of stacked [K, B, ...] and single
    [B, ...] batches); default is `jax.device_put` (with per-leaf
    `sharding` when given).
    """

    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []

    def put(batch):
        if place_fn is not None:
            return place_fn(batch)
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), batch, sharding)
        return jax.device_put(batch)

    def worker():
        try:
            for batch in batches:
                q.put(put(batch))
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]
