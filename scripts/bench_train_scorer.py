"""Train-mode grouped scorer A/B: fused two-pass Pallas kernel vs the
XLA path, forward+backward, at the train shapes (VERDICT r3 item 2b).

The full-step A/B (BENCH_TRAIN_KERNEL=on bench.py) compiles the kernel
+ custom-VJP body inside the 128-step LazyAdam scan — a 40+ minute
relay compile.  This bench isolates the lever: one scorer fwd+bwd
(value_and_grad over all weights AND inputs, i.e. the exact work the
train step's autodiff performs for one attention site), K repeats per
dispatch via lax.scan, forced-sync protocol (utils/device.py), median
of calls.  Inputs vary per scan iteration (i-dependent scaling) so
nothing is constant-folded.

Shapes: Taobao train B=512 L=50 G=5 and Kuaishou train B=256 L=250 G=5
(1 positive + 4 in-batch negatives, D=40, H=[80, 40] —
configs/clsr.yaml hidden sizes, base_model.py:627-708 scorer MLP).

Run: python scripts/bench_train_scorer.py [--k 32] [--calls 9]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = {
    "taobao": dict(B=512, L=50, G=5),
    "kuaishou": dict(B=256, L=250, G=5),
}
D = DK = 40
H0, H1 = 80, 40


def build(arm, sc, k):
    import jax
    import jax.numpy as jnp

    from clsr_tpu.ops.pallas_attention import (_xla_train_scorer,
                                               fused_train_attention)

    B, L, G = sc["B"], sc["L"], sc["G"]
    r = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32) * 0.1)
    keys, kp, q = f(B, L, DK), f(B, L, D), f(B, G, D)
    mask = jnp.asarray((r.rand(B, L) > 0.1).astype(np.float32))
    weights = (f(4 * D, H0), f(H0), jnp.abs(f(H0)) + 1.0, f(H0),
               f(H0, H1), f(H1), jnp.abs(f(H1)) + 1.0, f(H1), f(H1))

    def scorer(*a):
        if arm == "fused":
            out = fused_train_attention(*a)
        else:
            out = _xla_train_scorer(*a)
        return jnp.sum(out[0] ** 2) + sum(jnp.sum(o) for o in out[1:])

    vg = jax.value_and_grad(scorer, argnums=tuple(range(13)))

    def call(keys, kp, q, mask, weights, base):
        def body(acc, i):
            s = 1.0 + 1e-6 * (base + i).astype(jnp.float32)
            v, g = vg(keys * s, kp * s, q, mask, *weights)
            return acc + v + g[4][0, 0], ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return acc

    return (jax.jit(call), (keys, kp, q, mask, weights))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--calls", type=int, default=9)
    ap.add_argument("--shapes", default="taobao,kuaishou")
    ap.add_argument("--arms", default="xla,fused")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.utils.device import force_sync_dispatch

    results = {}
    synced = False
    for name in args.shapes.split(","):
        sc = SHAPES[name]
        for arm in args.arms.split(","):
            call, arrs = build(arm, sc, args.k)
            t0 = time.perf_counter()
            acc = call(*arrs, np.int32(0))
            jax.block_until_ready(acc)
            print(f"# {name}/{arm}: compile+first "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            if not synced:
                force_sync_dispatch()
                synced = True
            for _ in range(2):  # post-sync warmup
                jax.block_until_ready(call(*arrs, np.int32(1)))
            times, vals = [], []
            for c in range(args.calls):
                t0 = time.perf_counter()
                acc = call(*arrs, np.int32(c * args.k))
                jax.block_until_ready(acc)
                times.append(time.perf_counter() - t0)
                vals.append(acc)
            vals = [float(v) for v in vals]
            assert all(np.isfinite(v) for v in vals), vals
            times.sort()
            ms = times[len(times) // 2] / args.k * 1e3
            results[f"{name}/{arm}"] = ms
            print(f"# {name}/{arm}: {ms:.3f} ms/scorer-step "
                  f"(med call {times[len(times)//2]*1e3:.1f}ms, K={args.k})",
                  file=sys.stderr)
    for name in args.shapes.split(","):
        x, f = results.get(f"{name}/xla"), results.get(f"{name}/fused")
        if x and f:
            print(json.dumps({
                "metric": f"train_scorer_fwdbwd_{name}",
                "xla_ms": round(x, 3), "fused_ms": round(f, 3),
                "speedup": round(x / f, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
