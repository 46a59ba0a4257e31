"""Compare the Pallas recurrence kernel vs the XLA lax.scan path on TPU.

Honest protocol: forced-sync dispatch after warmup, inputs varied per
call (utils/device.py relay-mirage gotchas), K-chained applications.

Usage: python scripts/bench_pallas.py [--batch 512] [--seq 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--calls", type=int, default=20)
    ap.add_argument("--reps", type=int, default=20,
                    help="encoder applications chained per call")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from clsr_tpu.ops.fused_clsr import FusedCLSREncoder
    from clsr_tpu.utils.device import force_sync_dispatch

    B, L, U, H, D = args.batch, args.seq, 40, 40, 40
    rng = np.random.RandomState(0)
    hist = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.1)
    t_last = jnp.asarray(rng.rand(B, L).astype(np.float32))
    t_now = jnp.asarray(rng.rand(B, L).astype(np.float32))
    lengths = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    ushort = jnp.asarray(rng.randn(B, U).astype(np.float32) * 0.1)

    for use_pallas in (False, True):
        mod = FusedCLSREncoder(U, H, use_pallas=use_pallas)
        variables = mod.init(jax.random.PRNGKey(0), hist, t_last, t_now,
                             mask, ushort)

        # chain `reps` dependent applications inside ONE lax.scan so a
        # single dispatch covers many encoder runs (isolates device time
        # from call overhead).  ALL arrays are explicit jit arguments —
        # closure-captured constants get re-shipped per call on the
        # tunneled dev chip (~25ms/call of pure overhead).
        @jax.jit
        def many(v, key, h0, t_last, t_now, mask, ushort):
            h0 = h0 * (1.0 + 1e-6 * jax.random.uniform(key, ()))

            def body(h, i):
                h1, outs, h2 = mod.apply(v, h, t_last, t_now, mask, ushort)
                # genuine (tiny) carry dependency so the loop body cannot
                # be hoisted as loop-invariant
                return h + outs.mean() * 1e-9, outs.mean()
            _, accs = jax.lax.scan(body, h0, jnp.arange(args.reps))
            return accs.sum()

        times = []
        for c in range(args.calls + 4):
            key = jax.random.PRNGKey(c)   # vary inputs: relay caches
            t0 = time.perf_counter()
            out = many(variables, key, hist, t_last, t_now, mask, ushort)
            jax.block_until_ready(out)
            if c == 0:
                force_sync_dispatch()  # honest timings (utils/device.py)
            if c >= 4:
                times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2] / args.reps
        name = "pallas" if use_pallas else "lax.scan"
        print(f"{name:9s} {med*1e6:8.1f} us per encoder fwd "
              f"(B={B}, L={L})")


if __name__ == "__main__":
    sys.exit(main())
