"""Honest device timing through the dev-chip relay.

The single TPU in this environment is reached through a loopback relay
whose dispatch is ASYNCHRONOUS-BY-DEFAULT in a way that defeats timing:

  * before the process performs any device->host read,
    ``jax.Array.block_until_ready()`` returns after the call is
    *enqueued*, not executed — a 1.1 TFLOP matmul "completes" in 0.1 ms
    and the queued backlog later drains through a path ~200x slower than
    the chip (measured: 10 enqueued 8192^2 matmuls, read 75 s later);
  * the FIRST device->host read of any size (even ``float()`` of a jit
    scalar result) permanently flips the process into synchronous
    dispatch: every subsequent jitted call blocks for real device
    execution plus a ~25 ms relay round-trip.

Any benchmark that times ``block_until_ready`` without first forcing
synchronous mode therefore measures an enqueue rate (this produced the
round-1 "7-10M examples/s" figures; honest round-2 numbers are in
docs/RESULTS_r2.md).  The honest protocol is:

  1. compile + warm up the program,
  2. :func:`force_sync_dispatch` (one scalar read),
  3. time calls with ``block_until_ready`` — now truly blocking — and
     amortize the ~25 ms per-call relay round-trip over many device
     steps per call (``lax.scan`` multi-step) or subtract it via
     two-point extraction (:func:`per_step_seconds`).

On a directly-attached TPU ``force_sync_dispatch`` costs one no-op
scalar transfer and dispatch stays ~0.1 ms — the protocol is safe to
apply unconditionally.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, List

import numpy as np

_FORCED = False


def force_sync_dispatch() -> None:
    """Flip the runtime into synchronous (honest) dispatch mode.

    One tiny scalar device->host read; idempotent and cheap.  Call after
    compilation/warmup and BEFORE any timed region.
    """
    global _FORCED
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a + 1.0)(jnp.float32(0.0))
    assert float(x) == 1.0
    _FORCED = True


def timed_calls(fn: Callable[[], object], n_calls: int,
                warmup: int = 2) -> List[float]:
    """Run ``fn`` ``warmup + n_calls`` times, returning the timed tail.

    ``fn`` must return a jax value (blocked on with
    ``block_until_ready``).  ``force_sync_dispatch`` is applied first so
    the timings are execution, not enqueue.
    """
    import jax

    force_sync_dispatch()
    times: List[float] = []
    for c in range(warmup + n_calls):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        if c >= warmup:
            times.append(time.perf_counter() - t0)
    return times


def per_step_seconds(call_seconds_by_k: Iterable[tuple]) -> float:
    """Two-point extraction of marginal per-step time.

    Given ``[(k1, t1), (k2, t2), ...]`` median call times for programs
    that run ``k`` identical device steps per dispatch, returns the
    least-squares slope dt/dk — the per-step device time with the fixed
    per-call relay round-trip (~25 ms here) subtracted out.
    """
    pts = list(call_seconds_by_k)
    ks = np.array([float(k) for k, _ in pts])
    ts = np.array([float(t) for _, t in pts])
    if len(pts) < 2:
        raise ValueError("need call times at >=2 distinct K values")
    return float(np.polyfit(ks, ts, 1)[0])
