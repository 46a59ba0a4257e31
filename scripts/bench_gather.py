"""Embedding gather/dequant bandwidth on TPU: is there Pallas headroom?

ROADMAP r2 item 3 (measure before adopting): the one remaining
kernel-candidate op after the scorer-roofline verdict is the
bandwidth-bound table gather — f32 / bf16 storage on the training path
(sequential_base_model.py:381-438 lookups) and int8+scales dequant on
the serving path (serving.py:quantize_tables).  This measures XLA's
achieved HBM bandwidth for random-row gathers at Kuaishou dims; if XLA
sits near the chip's memory roofline there is nothing for a Pallas
kernel to win.

Usage: python scripts/bench_gather.py [--rows 500000] [--dim 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=40)
    ap.add_argument("--ids", type=int, default=256 * 250,
                    help="gathered rows per application (B*L)")
    ap.add_argument("--reps", type=int, default=50,
                    help="gather applications chained per call")
    ap.add_argument("--calls", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    N, D, M, K = args.rows, args.dim, args.ids, args.reps
    rng = np.random.RandomState(0)
    table_f32 = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.05)
    table_bf16 = table_f32.astype(jnp.bfloat16)
    scale = np.abs(np.asarray(table_f32)).max(axis=1, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    table_i8 = jnp.asarray(np.clip(
        np.round(np.asarray(table_f32) / scale), -127, 127).astype(np.int8))
    scales = jnp.asarray(scale.astype(np.float32))

    def run(label, fn, bytes_per_app, *operands):
        @jax.jit
        def prog(key, *ops):
            def body(acc, k):
                ids = jax.random.randint(
                    jax.random.fold_in(key, k), (M,), 0, N)
                return acc + fn(ids, *ops).sum(), 0

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc

        from clsr_tpu.utils.device import force_sync_dispatch

        times = []
        out = None
        for c in range(args.calls + 6):
            key = jax.random.PRNGKey(c)  # vary inputs: relay caches
            t0 = time.perf_counter()
            out = prog(key, *operands)
            out.block_until_ready()
            if c == 0:
                force_sync_dispatch()  # honest timings (utils/device.py)
            if c >= 6:
                times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        per_app = med / K
        gbs = bytes_per_app / per_app / 1e9
        print(f"{label:28s} {per_app * 1e6:8.1f}us/app  "
              f"{gbs:7.1f} GB/s   (sum={float(out):.3e})")

    # bytes touched per application: gathered rows (random — count the
    # row payload; ids themselves are noise)
    run("f32 gather", lambda ids, t: t[ids], M * D * 4, table_f32)
    run("bf16 gather", lambda ids, t: t[ids], M * D * 2, table_bf16)
    run("bf16 gather + f32 cast",
        lambda ids, t: t[ids].astype(jnp.float32), M * D * 2, table_bf16)
    run("int8 gather + dequant",
        lambda ids, t, s: t[ids].astype(jnp.float32) * s[ids],
        M * (D + 4), table_i8, scales)
    # contiguous-copy roofline proxy: same bytes, sequential rows
    run("f32 contiguous slice",
        lambda ids, t: jax.lax.dynamic_slice(
            t, (ids[0] % jnp.int32(1), 0), (M // 8, D)) * 1.0,
        (M // 8) * D * 4, table_f32)


if __name__ == "__main__":
    main()
