"""Kuaishou-scale throughput benchmark: max_seq_length 250, larger vocab.

Same methodology as bench.py (on-device batch synthesis, K steps per
dispatch, LazyAdam, median-of-calls, execution-sanity assertions) on the
long-sequence configuration that is the forcing function for the scan and
attention paths (SURVEY.md section 6).

Usage: python scripts/bench_kuaishou.py [--compute_dtype bfloat16]
           [--embedding_dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITEMS = 500_000
N_CATES = 2_000
N_USERS = 100_000
BATCH = 256   # --batch overrides
SEQ = 250
# the sync-mode relay adds ~25ms per CALL (utils/device.py); K=64
# steps per dispatch amortizes it to <0.4ms/step (scan compile time is
# ~independent of K)
STEPS_PER_CALL = 64
WARMUP_CALLS = 5
CALLS = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--embedding_dtype", default="float32")
    ap.add_argument("--scan_unroll", type=int, default=1)
    ap.add_argument("--compact_rows", default="auto",
                    help="auto|off — compact row engine (compact_rows.py)")
    ap.add_argument("--train_kernel", default=None,
                    help="on|off|auto — fused train-mode attention scorer "
                         "(use_pallas_train_attention)")
    args = ap.parse_args()
    global BATCH
    if args.batch:
        BATCH = args.batch

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    import jax.numpy as jnp

    from __graft_entry__ import _taobao_cfg, _tiny_batch
    from clsr_tpu.data.batch import Batch
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_train_step_fn

    cfg = _taobao_cfg(batch_size=BATCH, optimizer="lazyadam",
                      max_seq_length=SEQ, time_unit="ms",
                      train_steps_per_call=STEPS_PER_CALL,
                      compute_dtype=args.compute_dtype,
                      embedding_dtype=args.embedding_dtype,
                      scan_unroll=args.scan_unroll,
                      compact_rows=args.compact_rows,
                      **({"use_pallas_train_attention": args.train_kernel}
                         if args.train_kernel else {}))
    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)

    from clsr_tpu.data.synthetic import device_batch as _db
    device_batch = lambda key: _db(key, BATCH, SEQ, N_ITEMS, N_CATES, N_USERS)

    raw_step = make_train_step_fn(model, cfg)

    def bench_call(state, rng):
        def body(st, i):
            k = jax.random.fold_in(rng, i)
            st, parts = raw_step(st, device_batch(jax.random.fold_in(k, 0)),
                                 jax.random.fold_in(k, 1))
            return st, parts.loss
        return jax.lax.scan(body, state, jnp.arange(STEPS_PER_CALL))

    bench_call = jax.jit(bench_call, donate_argnums=(0,))

    sample = _tiny_batch(B=BATCH, L=SEQ, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg, sample)
    rng = jax.random.PRNGKey(0)

    from clsr_tpu.utils.device import force_sync_dispatch

    for w in range(WARMUP_CALLS):
        rng, sub = jax.random.split(rng)
        state, losses = bench_call(state, sub)
        jax.block_until_ready(losses)
        if w == 0:
            force_sync_dispatch()  # honest timings (utils/device.py)

    times, trace = [], []
    for _ in range(CALLS):
        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        state, losses = bench_call(state, sub)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
        trace.append(losses[-1])
    trace = [float(l) for l in trace]
    assert all(np.isfinite(l) for l in trace), trace
    assert len(set(trace)) > 1

    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({
        "metric": "clsr_train_throughput_1chip_kuaishou",
        "value": round(BATCH * STEPS_PER_CALL / dt, 1),
        "unit": "examples/sec",
        "config": (f"B={BATCH} L={SEQ} items={N_ITEMS} "
                   f"compute={args.compute_dtype} "
                   f"emb={args.embedding_dtype} "
                   f"unroll={args.scan_unroll}"),
    }))


if __name__ == "__main__":
    sys.exit(main())
