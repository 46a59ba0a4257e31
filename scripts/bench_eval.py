"""Honest grouped-eval scoring throughput (replaces retracted r1 figure).

Grouped eval scores 1 pos + test_num_ngs negatives per impression in a
single encoder pass (the reference replicates each row per candidate:
sequential_iterator.py:344-394).  The round-1 "24.9M scored rows/s"
figure was an enqueue-rate mirage; this measures honestly via two-point
K extraction (clsr_tpu/utils/device.py): K eval applications chained in
one lax.scan, marginal dt/dK.

Usage: python scripts/bench_eval.py [--batch 64] [--groups 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--groups", type=int, default=100)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--pallas", action="store_true",
                    help="fused eval attention kernel (ops/pallas_attention)")
    ap.add_argument("--check", action="store_true",
                    help="cross-check kernel preds vs XLA preds on one batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from __graft_entry__ import _taobao_cfg, _tiny_batch
    from clsr_tpu.data.synthetic import device_batch
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step_fn
    from clsr_tpu.utils.device import force_sync_dispatch

    B, G, L = args.batch, args.groups, args.seq
    N_ITEMS, N_CATES, N_USERS = 100_000, 5_000, 8_000
    cfg = _taobao_cfg(batch_size=B)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    sample = _tiny_batch(B=B, L=L, G=G, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg, sample)
    if args.pallas:
        cfg = cfg.replace(use_pallas_eval_attention="on")
    eval_fn = make_eval_step_fn(model, cfg)

    if args.check:
        xla_fn = jax.jit(make_eval_step_fn(model, cfg, allow_pallas=False))
        ker_fn = jax.jit(make_eval_step_fn(model, cfg, allow_pallas=True))
        b = jax.jit(lambda k: device_batch(k, B, L, N_ITEMS, N_CATES,
                                           N_USERS, G=G))(jax.random.PRNGKey(9))
        p_x, _ = xla_fn(state, b)
        p_k, _ = ker_fn(state, b)
        diff = float(jnp.max(jnp.abs(p_x - p_k)))
        print(f"check: max|preds_xla - preds_pallas| = {diff:.3e}", flush=True)

    def measure(K):
        @jax.jit
        def prog(key, state):
            def body(acc, k):
                b = device_batch(jax.random.fold_in(key, k), B, L,
                                 N_ITEMS, N_CATES, N_USERS, G=G)
                preds, _ = eval_fn(state, b)
                return acc + jnp.sum(preds), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc

        out = prog(jax.random.PRNGKey(0), state)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, args.calls + 1):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), state)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t16, t64 = measure(16), measure(64)
    per_app = (t64 - t16) / 48.0
    rows = B * G
    print(f"eval B={B} G={G} L={L}: {per_app*1e3:.2f}ms/app  "
          f"{rows/per_app/1e6:.2f}M scored rows/s (honest)", flush=True)


if __name__ == "__main__":
    main()
