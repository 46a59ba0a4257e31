"""Calibrate the chip: HBM bandwidth, MXU rate, rng, gather/scatter cost.

Establishes the machine parameters that kernel-level design decisions
rest on (roofline reasoning needs the real ceilings, not the spec
sheet — this chip is reached through a relay and may not be a stock
v5e).  Honest protocol: force_sync_dispatch + TWO-POINT K extraction
(the sync-mode relay adds a ~44ms per-call floor; the dt/dK slope
between K and 4K chained applications cancels it) — see
clsr_tpu/utils/device.py and docs/RESULTS_r2.md "Row-op cost model".

Usage: python scripts/bench_machine.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_LO, K_HI = 16, 64


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.utils.device import force_sync_dispatch

    rng = np.random.RandomState(0)

    def measure(K, body, operands):
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
        for c in range(1, 6):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), *operands)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def bench(label, body, note, *operands):
        t_lo = measure(K_LO, body, operands)
        t_hi = measure(K_HI, body, operands)
        per = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{label:42s} {per*1e6:9.1f} us/app   {note(per)}", flush=True)
        return per

    MB = 1e6

    # HBM bandwidth: fused mul+reduce = one full read of the operand
    for nbytes in (12.8 * MB, 102.4 * MB, 409.6 * MB):
        x = jnp.asarray(rng.randn(int(nbytes) // 4).astype(np.float32))
        bench(f"reduce {nbytes/MB:.0f}MB (1 HBM read)",
              lambda key, x: jnp.sum(
                  x * (1.0 + 1e-9 * key[0].astype(jnp.float32))),
              lambda t, n=nbytes: f"-> {n/t/1e9:6.1f} GB/s", x)

    # copy: read + write
    x = jnp.asarray(rng.randn(25_600_000).astype(np.float32))  # 102.4MB
    bench("copy 102.4MB (read+write)",
          lambda key, x: (x + key[0].astype(jnp.float32))[0],
          lambda t: f"-> {2*102.4*MB/t/1e9:6.1f} GB/s", x)

    # MXU f32 and bf16 (large matmul: compute-bound)
    for n, dt, label in ((4096, jnp.float32, "matmul 4096^3 f32"),
                         (4096, jnp.bfloat16, "matmul 4096^3 bf16"),
                         (8192, jnp.bfloat16, "matmul 8192^3 bf16")):
        a = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.02).astype(dt)
        flops = 2.0 * n ** 3
        bench(label,
              lambda key, a: jnp.sum(
                  ((a + key[0].astype(a.dtype)) @ a).astype(jnp.float32)),
              lambda t, f=flops: f"-> {f/t/1e12:6.1f} TFLOP/s", a)

    # small-matmul rate (recurrence-step shape, [512,40]x[40,160])
    a = jnp.asarray(rng.randn(512, 40).astype(np.float32))
    w = jnp.asarray(rng.randn(40, 160).astype(np.float32))
    bench("matmul [512,40]x[40,160] f32 (6.6 MFLOP)",
          lambda key, a, w: jnp.sum(
              (a + key[0].astype(jnp.float32) * 1e-9) @ w),
          lambda t: f"-> {6.6e6/t/1e12:6.2f} TFLOP/s", a, w)


if __name__ == "__main__":
    main()
