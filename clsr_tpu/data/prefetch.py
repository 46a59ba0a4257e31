"""Host->device prefetching.

The reference's input pipeline is a synchronous Python generator feeding
feed_dicts (SURVEY.md section 2.4: "Data pipeline parallelism: none").
Here a background thread assembles host batches and eagerly `device_put`s
them (optionally with an explicit sharding) so the accelerator never waits
on the host: while step N runs, batch N+1..N+depth are already in HBM.

Abandonment safety (round 5): a consumer that stops early (early stop,
an exception, a killed epoch) CLOSES the generator; the producer thread
is unblocked via a stop flag + queue drain and exits, dropping its
references.  Without this, every abandoned iterator pinned its epoch's
stacked arrays behind a forever-blocked q.put — ~2-4 GB per
early-stopped fit at kuaishou dims, enough to OOM a host over a
multi-run study (observed: 130 GB RSS after 8 L=250 runs).
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
    stop = threading.Event()

    def put(batch):
        if place_fn is not None:
            return place_fn(batch)
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), batch, sharding)
        return jax.device_put(batch)

    def enqueue(item) -> bool:
        """Bounded put that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batches:
                if not enqueue(put(batch)):
                    return
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            enqueue(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
    finally:
        # consumer gone (early stop / exception / GeneratorExit): release
        # the producer and drop queued references
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
