"""Honest TPU microbenchmarks for embedding row ops (gather/scatter/sort).

The honest step profile (docs/RESULTS_r2.md) shows the CLSR train step
spends ~4.8ms of 8.6ms in the backward; the candidate explanation is
table-gradient scatter-adds (reference lookups:
sequential_base_model.py:364-438) plus LazyAdam's gather + scatter-set
traffic.  This measures the true per-application cost of each row op.

Protocol: sync-mode calls carry a ~25-45ms relay round-trip FLOOR that
buries any single op (clsr_tpu/utils/device.py), so every op is chained
K times inside one lax.scan and measured at TWO K values; the reported
cost is the marginal dt/dK (slope), which cancels the floor.  Ids are
regenerated per application from a folded key; the rng floor is
measured by the `ids-gen baseline` row — subtract it mentally from the
op rows (it is included in each).

Usage: python scripts/bench_rowops.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_LO, K_HI = 64, 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--m", type=int, default=25_600, help="rows per app (B*L)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.utils.device import force_sync_dispatch

    M = args.m
    rng = np.random.RandomState(0)

    def measure(K, body, operands):
        @jax.jit
        def prog(key, *ops):
            def sbody(acc, k):
                out = body(jax.random.fold_in(key, k), *ops)
                return acc + jnp.sum(out).astype(jnp.float32), 0
            acc, _ = jax.lax.scan(sbody, jnp.float32(0), jnp.arange(K))
            return acc

        out = prog(jax.random.PRNGKey(0), *operands)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, args.calls + 1):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), *operands)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def bench(label, body, *operands):
        t_lo = measure(K_LO, body, operands)
        t_hi = measure(K_HI, body, operands)
        per_app = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{label:46s} {per_app*1e6:9.1f} us/app  "
              f"({per_app/M*1e9:6.2f} ns/row)", flush=True)
        return per_app

    def ids_of(key, n):
        return jax.random.randint(key, (M,), 0, n)

    N, D = 100_000, 32
    tab = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.05)
    rows = jnp.asarray(rng.randn(M, D).astype(np.float32))

    bench("ids-gen baseline (randint[M]+sum)",
          lambda key: ids_of(key, N).astype(jnp.float32))

    for N2, D2 in ((100_000, 32), (100_000, 96), (500_000, 40)):
        tab2 = jnp.asarray(rng.randn(N2, D2).astype(np.float32) * 0.05)
        rows2 = jnp.asarray(rng.randn(M, D2).astype(np.float32))
        hdr = f"N={N2//1000}k D={D2}"
        bench(f"{hdr} scatter-add",
              lambda key, r: jnp.zeros((N2, D2), jnp.float32)
              .at[ids_of(key, N2)].add(r), rows2)
        bench(f"{hdr} scatter-set sorted+unique-hint",
              lambda key, r: jnp.zeros((N2, D2), jnp.float32)
              .at[jnp.sort(ids_of(key, N2))]
              .set(r, indices_are_sorted=True, unique_indices=True), rows2)
        bench(f"{hdr} table gather",
              lambda key, t: t[ids_of(key, N2)], tab2)

    bench("sort int32 [M]",
          lambda key: jnp.sort(ids_of(key, N)).astype(jnp.float32))
    bench("argsort int32 [M]",
          lambda key: jnp.argsort(ids_of(key, N)).astype(jnp.float32))
    bench("sort + searchsorted [M]->[M]",
          lambda key: jnp.searchsorted(
              jnp.sort(ids_of(key, N)),
              ids_of(jax.random.fold_in(key, 7), N)).astype(jnp.float32))

    def onehot_compact(key, r, dtype):
        cols = jax.random.randint(jax.random.fold_in(key, 1), (M,), 0, M)
        oh = jax.nn.one_hot(cols, M, dtype=dtype)
        return jax.lax.dot_general(
            oh, r.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    bench("compact one-hot matmul bf16 [M->M]",
          lambda key, r: onehot_compact(key, r, jnp.bfloat16), rows)
    bench("segment_sum sorted ids [M->M]",
          lambda key, r: jax.ops.segment_sum(
              r, jnp.sort(jax.random.randint(key, (M,), 0, M)),
              num_segments=M, indices_are_sorted=True), rows)


if __name__ == "__main__":
    main()
