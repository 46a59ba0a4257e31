"""Grouped-attention scorer: split-first-layer vs concat formulation.

Measures forward+backward wall time of the target-attention scorer
(TargetAttention, ops/attention.py) against the round-1 concat
formulation (the reference's layout, clsr.py:355-368) at training shapes.

Run on the TPU: python scripts/bench_attention.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(fn, args, warmup=5, calls=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from clsr_tpu.ops.attention import TargetAttention
    from tests.test_attention_split import manual_attention

    for (B, G, L, D) in [(512, 5, 50, 40), (256, 5, 250, 40),
                         (64, 100, 250, 40), (512, 5, 1000, 40)]:
        rng = np.random.RandomState(0)
        keys = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
        query = jnp.asarray(rng.randn(B, G, D).astype(np.float32))
        mask = jnp.asarray((np.arange(L)[None] <
                            rng.randint(1, L + 1, B)[:, None])
                           .astype(np.float32))
        mod = TargetAttention((80, 40), ("relu", "relu"), enable_bn=False)
        params = mod.init(jax.random.PRNGKey(1), query, keys, mask)["params"]

        @jax.jit
        def split_fb(p, q, k, m):
            def loss(p):
                return jnp.sum(mod.apply({"params": p}, q, k, m) ** 2)
            return jax.value_and_grad(loss)(p)

        @jax.jit
        def concat_fb(p, q, k, m):
            def loss(p):
                return jnp.sum(manual_attention(p, q, k, m, (80, 40)) ** 2)
            return jax.value_and_grad(loss)(p)

        t_split = bench(split_fb, (params, query, keys, mask))
        t_concat = bench(concat_fb, (params, query, keys, mask))
        print(f"B={B} G={G} L={L}: concat {t_concat*1e3:7.2f}ms  "
              f"split {t_split*1e3:7.2f}ms  speedup {t_concat/t_split:5.2f}x")


if __name__ == "__main__":
    main()
