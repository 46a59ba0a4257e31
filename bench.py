"""Benchmark: CLSR training throughput on one chip.

Measures steady-state examples/sec (positive instances/sec, i.e. file
lines — each expands to 1+train_num_ngs scored candidates on device) for
the full training step on a Taobao-shaped CLSR config (max_seq_length 50,
dims 32/8/40, batch 512, 4 in-batch negatives, realistic vocab sizes),
using the framework's recommended production settings:

  * lazyadam — sparse row-wise Adam on the embedding tables, one of the
    reference's own optimizer options (base_model.py:275-276);
  * train_steps_per_call=16 — 16 optimizer steps per dispatch via
    lax.scan (training/steps.py:make_multi_train_step), amortizing the
    host->device call overhead that otherwise dominates this model's
    ~0.1 ms device step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (TF1.15 graph mode, feed_dict, 3 dynamic_rnn
while-loops per step, host-side negative sampling) publishes no throughput
numbers (BASELINE.md).  We use an estimated 4,000 examples/s for the
reference on a desktop GPU — consistent with feed_dict-bound TF1
sequential recommenders at batch 500 — and report vs_baseline against it.
The BASELINE.md target is >=5x.
"""

import json
import sys
import time

import numpy as np

TF1_BASELINE_EXAMPLES_PER_SEC = 4000.0

N_ITEMS = 100_000
N_CATES = 5_000
N_USERS = 50_000
BATCH = 512
STEPS_PER_CALL = 16
WARMUP_CALLS = 6   # the tunneled chip's first post-compile calls can stall
CALLS = 20


def main():
    import jax

    from __graft_entry__ import _taobao_cfg, _tiny_batch
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import (make_multi_train_step,
                                         stack_batches)

    cfg = _taobao_cfg(batch_size=BATCH, optimizer="lazyadam",
                      train_steps_per_call=STEPS_PER_CALL)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)

    # ONE device-resident stack of K batches, reused across calls.  The
    # benchmark measures CHIP training throughput; in production the host
    # pipeline overlaps uploads with compute (data/prefetch.py).  On this
    # tunneled dev chip, rotating freshly-uploaded stacks would measure the
    # relay's ~140MB/s upload path instead of the TPU.
    group = [_tiny_batch(B=BATCH, L=cfg.max_seq_length, n_items=N_ITEMS,
                         n_cates=N_CATES, rng_seed=i)
             for i in range(STEPS_PER_CALL)]
    stack = jax.device_put(stack_batches(group))

    state = create_train_state(model, cfg, group[0])
    multi = make_multi_train_step(model, cfg, STEPS_PER_CALL)
    rng = jax.random.PRNGKey(0)

    for _ in range(WARMUP_CALLS):
        rng, sub = jax.random.split(rng)
        state, parts = multi(state, stack, sub)
        jax.block_until_ready(parts.loss)

    times = []
    for _ in range(CALLS):
        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        state, parts = multi(state, stack, sub)
        jax.block_until_ready(parts.loss)
        times.append(time.perf_counter() - t0)

    # median per-call time: robust to sporadic multi-hundred-ms stalls of
    # the tunneled device (observed once after warmup)
    times.sort()
    dt = times[len(times) // 2]
    examples_per_sec = BATCH * STEPS_PER_CALL / dt
    print(json.dumps({
        "metric": "clsr_train_throughput_1chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / TF1_BASELINE_EXAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
