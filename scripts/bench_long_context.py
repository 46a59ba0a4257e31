"""Long-context attention: blockwise streaming vs plain scorer, honest.

The plain target-attention scorer materializes [B, L, G, H] hidden
activations (~820MB at B=512 L=1000 G=5 H=80) — the long-context module
(ops/long_context.py) computes the same math in key blocks with a
streaming softmax and O(B*block*G*H) live memory.  This measures
fwd+bwd per application under the honest protocol
(clsr_tpu/utils/device.py) so the extension's perf claim is grounded,
and finds the crossover L.

Run on the TPU: python scripts/bench_long_context.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K_APPS = 4


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.ops.attention import TargetAttention
    from clsr_tpu.ops.long_context import LongTargetAttention
    from clsr_tpu.utils.device import force_sync_dispatch
    from tests.test_long_context import _map_params

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

    LAYERS = (80, 40)
    for (B, G, L) in [(512, 5, 250), (512, 5, 1000), (512, 5, 4000),
                      (128, 5, 16000)]:
        D = 40
        rng = np.random.RandomState(0)
        q0 = jnp.asarray(rng.randn(B, G, D).astype(np.float32))
        k0 = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
        m0 = jnp.ones((B, L), jnp.float32)
        plain = TargetAttention(LAYERS, ("relu", "relu"), enable_bn=False)
        params = plain.init(jax.random.PRNGKey(1), q0, k0, m0)["params"]
        blockwise = LongTargetAttention(LAYERS, block_size=256)

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
        try:
            t_plain = bench(make_prog(
                lambda p, q, k, m: plain.apply({"params": p}, q, k, m)),
                params) - t_gen
        except Exception as e:
            t_plain = float("nan")
            print(f"  plain failed at L={L}: {type(e).__name__}")
        t_blk = bench(make_prog(
            lambda p, q, k, m: blockwise.apply(
                {"params": _map_params(p)}, q, k, m)),
            params) - t_gen
        print(f"B={B} G={G} L={L}: gen {t_gen*1e3:6.2f}ms  "
              f"plain {t_plain*1e3:8.2f}ms  blockwise {t_blk*1e3:8.2f}ms  "
              f"ratio {t_plain/t_blk:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
