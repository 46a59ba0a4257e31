"""Honest fwd/bwd cost of the fused CLSR recurrence at Kuaishou shapes.

The pmn work left the backward as the largest Kuaishou stage
(docs/RESULTS_r2.md); this isolates the scan's share and A/Bs the
levers that act on it: bf16 compute (halves per-step matmul + residual
traffic), scan unroll, and the block-diagonal cell-matmul fusion.

Usage: python scripts/bench_scan.py [--batch 256] [--len 250]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--len", type=int, dest="length", default=250)
    ap.add_argument("--dim", type=int, default=40)   # item+cate emb dim
    ap.add_argument("--user_dim", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=40)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--calls", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from clsr_tpu.ops.fused_clsr import FusedCLSREncoder
    from clsr_tpu.utils.device import force_sync_dispatch

    B, L, D = args.batch, args.length, args.dim
    U, H, K = args.user_dim, args.hidden, args.reps
    rng = np.random.RandomState(0)
    hist = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.1)
    t_last = jnp.asarray(rng.rand(B, L).astype(np.float32))
    t_now = jnp.asarray(rng.rand(B, L).astype(np.float32))
    mask = jnp.ones((B, L), jnp.float32)
    user_short = jnp.asarray(rng.randn(B, U).astype(np.float32) * 0.1)

    def bench(label, dtype, unroll, blockdiag, mode, remat=False,
              concat=True, remat_body=False, custom_vjp=False):
        mod = FusedCLSREncoder(U, H, dtype=dtype, unroll=unroll,
                               fuse_cell_matmuls=blockdiag,
                               concat_scan_inputs=concat,
                               remat_body=remat_body,
                               custom_vjp_scan=custom_vjp)
        variables = mod.init(jax.random.PRNGKey(0), hist, t_last, t_now,
                             mask, user_short)

        def one(params, h):
            def enc(params, h):
                h1, outs, h2 = mod.apply({"params": params}, h, t_last,
                                         t_now, mask, user_short)
                return jnp.sum(h1) + jnp.sum(outs) + jnp.sum(h2)
            if remat:
                enc = jax.checkpoint(enc)
            return enc(params, h)

        def prog(key, params):
            def body(acc, k):
                h = hist * (1.0 + 1e-6 * jax.random.uniform(
                    jax.random.fold_in(key, k), ()))
                if mode == "fwd":
                    return acc + one(params, h), 0
                l, g = jax.value_and_grad(one)(params, h)
                return acc + l + 0.0 * sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(g)), 0

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc

        prog = jax.jit(prog)
        times = []
        out = None
        for c in range(args.calls + 4):
            key = jax.random.PRNGKey(c)
            t0 = time.perf_counter()
            out = prog(key, variables["params"])
            out.block_until_ready()
            if c == 0:
                force_sync_dispatch()
            if c >= 4:
                times.append(time.perf_counter() - t0)
        med = float(np.median(times)) / K
        print(f"{label:34s} {med * 1e3:7.2f}ms/app  (sum={float(out):.3e})",
              flush=True)
        return med

    # each variant is a separate ~5-10min TPU compile through the relay —
    # select what you pay for
    # (dtype, unroll, blockdiag, remat_whole_encoder, concat, remat_body
    #  [, custom_vjp])
    variants = {
        "f32cv": (None, 1, True, False, True, False, True),
        "bf16cv": (jnp.bfloat16, 1, True, False, True, False, True),
        "f32": (None, 1, True, False, True, False),
        "bf16": (jnp.bfloat16, 1, True, False, True, False),
        "f32nocat": (None, 1, True, False, False, False),
        "bf16nocat": (jnp.bfloat16, 1, True, False, False, False),
        "f32rb": (None, 1, True, False, True, True),
        "f32nocatrb": (None, 1, True, False, False, True),
        "bf16nocatrb": (jnp.bfloat16, 1, True, False, False, True),
        "bf16rb": (jnp.bfloat16, 1, True, False, True, True),
        "f32u4": (None, 4, True, False, True, False),
        "bf16u4": (jnp.bfloat16, 4, True, False, True, False),
        "f32percell": (None, 1, False, False, False, False),
        "bf16percell": (jnp.bfloat16, 1, False, False, False, False),
        "f32remat": (None, 1, True, True, True, False),
        "bf16remat": (jnp.bfloat16, 1, True, True, True, False),
    }
    sel = os.environ.get("SCAN_VARIANTS", "f32,bf16").split(",")
    for name in sel:
        v = variants[name]
        dtype, unroll, blockdiag, remat, concat, remat_body = v[:6]
        custom = v[6] if len(v) > 6 else False
        if "remat" not in name and "rb" not in name and "cv" not in name:
            bench(f"fwd  {name}", dtype, unroll, blockdiag, "fwd",
                  concat=concat, remat_body=remat_body)
        bench(f"grad {name}", dtype, unroll, blockdiag, "grad",
              remat=remat, concat=concat, remat_body=remat_body,
              custom_vjp=custom)


if __name__ == "__main__":
    main()
