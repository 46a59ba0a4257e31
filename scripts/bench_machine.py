"""Calibrate the chip: HBM bandwidth, MXU rate, rng, gather/scatter cost.

Establishes the machine parameters that every kernel-level design
decision rests on (roofline reasoning needs the real ceilings, not the
spec sheet — this chip is reached through a relay and may not be a
stock v5e).  Honest protocol per clsr_tpu/utils/device.py.

Usage: python scripts/bench_machine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.utils.device import force_sync_dispatch

    K = 16
    rng = np.random.RandomState(0)

    def bench(label, body, note, *operands):
        @jax.jit
        def prog(key, *ops):
            def sbody(acc, k):
                return acc + body(jax.random.fold_in(key, k), *ops), 0
            acc, _ = jax.lax.scan(sbody, jnp.float32(0), jnp.arange(K))
            return acc

        out = prog(jax.random.PRNGKey(0), *operands)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, 7):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), *operands)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times)) / K
        print(f"{label:42s} {med*1e6:9.1f} us/app   {note(med)}", flush=True)
        return med

    MB = 1e6

    # HBM bandwidth: fused mul+reduce = one full read of the operand
    for nbytes in (12.8 * MB, 102.4 * MB):
        x = jnp.asarray(rng.randn(int(nbytes) // 4).astype(np.float32))
        bench(f"reduce {nbytes/MB:.0f}MB (1 HBM read)",
              lambda key, x: jnp.sum(x * (1.0 + 1e-9 * key[0].astype(
                  jnp.float32))),
              lambda t, n=nbytes: f"-> {n/t/1e9:6.1f} GB/s", x)

    # copy: read + write
    x = jnp.asarray(rng.randn(3_200_000).astype(np.float32))  # 12.8MB
    bench("copy 12.8MB (read+write)",
          lambda key, x: (x + key[0].astype(jnp.float32))[0],
          lambda t: f"-> {2*12.8*MB/t/1e9:6.1f} GB/s", x)

    # MXU f32 and bf16
    a = jnp.asarray(rng.randn(2048, 2048).astype(np.float32))
    bench("matmul 2048^3 f32 (17.2 GFLOP)",
          lambda key, a: jnp.sum(
              (a + key[0].astype(jnp.float32) * 1e-9) @ a),
          lambda t: f"-> {17.2e9/t/1e12:6.1f} TFLOP/s", a)
    ab = a.astype(jnp.bfloat16)
    bench("matmul 2048^3 bf16",
          lambda key, a: jnp.sum(
              ((a + key[0].astype(jnp.bfloat16)) @ a)
              .astype(jnp.float32)),
          lambda t: f"-> {17.2e9/t/1e12:6.1f} TFLOP/s", ab)

    # rng generation cost at the microbench id-vector size
    M = 25_600
    bench(f"randint [{M}] + sum (rng floor)",
          lambda key: jax.random.randint(key, (M,), 0, 100_000)
          .sum().astype(jnp.float32),
          lambda t: "")

    # gather/scatter with PRE-STACKED ids (no rng in the body)
    N, D = 100_000, 32
    tab = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.05)
    rows = jnp.asarray(rng.randn(M, D).astype(np.float32))
    idstack = jnp.asarray(rng.randint(0, N, (K, M)).astype(np.int32))

    @jax.jit
    def gather_prog(idstack, tab):
        def body(acc, i):
            return acc + jnp.sum(tab[idstack[i]]), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    @jax.jit
    def scatter_prog(idstack, rows):
        def body(acc, i):
            return acc + jnp.sum(
                jnp.zeros((N, D), jnp.float32).at[idstack[i]].add(rows)[0]), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    for label, prog, ops in (
            ("gather 25.6k rows (stacked ids, sum MD)",
             gather_prog, (idstack, tab)),
            ("scatter-add 25.6k rows (stacked ids, sum D)",
             scatter_prog, (idstack, rows))):
        out = prog(*ops)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(6):
            # vary by rolling the idstack so the relay can't cache
            ops2 = (jnp.roll(ops[0], c, axis=0),) + ops[1:]
            jax.block_until_ready(ops2[0])
            t0 = time.perf_counter()
            out = prog(*ops2)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times)) / K
        print(f"{label:42s} {med*1e6:9.1f} us/app   "
              f"-> {med/M*1e9:5.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
