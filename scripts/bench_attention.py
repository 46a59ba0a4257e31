"""Grouped-attention scorer: split-first-layer vs concat formulation.

Measures forward+backward time of the target-attention scorer
(TargetAttention, ops/attention.py) against the round-1 concat
formulation (the reference's layout, clsr.py:355-368) at training
shapes.

HONEST protocol (clsr_tpu/utils/device.py): K applications chained in
one lax.scan per dispatch, per-app inputs regenerated on device from a
folded key (the generation cost is measured separately and subtracted),
synchronous dispatch forced after compile, median of calls.  A scalar
probe of every gradient leaf is folded into the carry so the backward
cannot be dead-code-eliminated.

Run on the TPU: python scripts/bench_attention.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K_APPS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.ops.attention import TargetAttention
    from clsr_tpu.utils.device import force_sync_dispatch
    from tests.test_attention_split import manual_attention

    def bench(prog, params):
        out = prog(jax.random.PRNGKey(0), params)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, 8):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), params)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K_APPS

    for (B, G, L, D) in [(512, 5, 50, 40), (256, 5, 250, 40),
                         (64, 100, 250, 40), (512, 5, 1000, 40)]:
        rng = np.random.RandomState(0)
        q0 = jnp.asarray(rng.randn(B, G, D).astype(np.float32))
        k0 = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
        m0 = jnp.ones((B, L), jnp.float32)
        mod = TargetAttention((80, 40), ("relu", "relu"), enable_bn=False)
        params = mod.init(jax.random.PRNGKey(1), q0, k0, m0)["params"]

        def gen(key):
            kq, kk, km = jax.random.split(key, 3)
            q = jax.random.normal(kq, (B, G, D))
            k = jax.random.normal(kk, (B, L, D))
            lens = jax.random.randint(km, (B, 1), 1, L + 1)
            m = (jnp.arange(L)[None, :] < lens).astype(jnp.float32)
            return q, k, m

        def make_prog(apply_fn):
            @jax.jit
            def prog(key, params):
                def body(acc, i):
                    q, k, m = gen(jax.random.fold_in(key, i))
                    if apply_fn is None:
                        return acc + q[0, 0, 0] + k[0, 0, 0] + m[0, 0], 0

                    def loss(p):
                        return jnp.sum(apply_fn(p, q, k, m) ** 2)

                    val, grads = jax.value_and_grad(loss)(params)
                    probe = sum(g.ravel()[0] for g in
                                jax.tree_util.tree_leaves(grads))
                    return acc + val + probe, 0
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(K_APPS))
                return acc
            return prog

        t_gen = bench(make_prog(None), params)
        t_split = bench(make_prog(
            lambda p, q, k, m: mod.apply({"params": p}, q, k, m)), params)
        t_concat = bench(make_prog(
            lambda p, q, k, m: manual_attention(p, q, k, m, (80, 40))),
            params)
        s = t_split - t_gen
        c = t_concat - t_gen
        print(f"B={B} G={G} L={L}: gen {t_gen*1e3:6.2f}ms  "
              f"concat {c*1e3:7.2f}ms  split {s*1e3:7.2f}ms  "
              f"speedup {c/s:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
