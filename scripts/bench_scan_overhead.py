"""Isolate WHAT makes a lax.scan iteration cost ~10us on this chip.

docs/RESULTS_r2.md established the fused CLSR scan is per-iteration-
bound (not FLOPs: the blockdiag step is ~10 MFLOP; not residual
bandwidth: remat loses).  Hypothesis: the cost is per-iteration HBM
dynamic-slice/dynamic-update-slice latency — the body reads a slice of
each of 6 scanned input arrays and writes stacked outputs (and, in the
backward, stacked residuals) every iteration.  If true, CONCATENATING
the scanned inputs into one array (one slice per iteration instead of
6) is a cheap win that composes with everything else.

Probes (B=256, L=250, honest forced-sync protocol, K reps/dispatch):
  A. empty-ish scan (carry-only elementwise body, no scanned inputs)
  B. carry body + N separate scanned input arrays (N = 1, 6)
  C. same total input bytes as B6, concatenated into ONE array
  D. B6/C with one [B,120]x[120,320] matmul in the body (realistic)
  E. fwd+bwd of D variants (residual side)

Usage: python scripts/bench_scan_overhead.py [--batch 256] [--len 250]
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--calls", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    from clsr_tpu.utils.device import force_sync_dispatch

    B, L, K = args.batch, args.length, args.reps
    rng = np.random.RandomState(0)
    # 6 input arrays matching the fused-scan shapes: 320+80+40+40+40+1
    widths = [320, 80, 40, 40, 40, 8]
    xs = [jnp.asarray(rng.randn(L, B, w).astype(np.float32) * 0.1)
          for w in widths]
    xcat = jnp.concatenate(xs, axis=-1)            # [L, B, 528]
    W = jnp.asarray(rng.randn(120, 320).astype(np.float32) * 0.05)
    h0 = jnp.asarray(rng.randn(B, 120).astype(np.float32) * 0.1)

    def timeit(label, prog, *operands):
        prog = jax.jit(prog)
        times = []
        out = None
        for c in range(args.calls + 6):
            key = jax.random.PRNGKey(c)
            t0 = time.perf_counter()
            out = prog(key, *operands)
            out.block_until_ready()
            if c == 0:
                force_sync_dispatch()
            if c >= 6:   # repo convention: >=6 warmup calls (CLAUDE.md)
                times.append(time.perf_counter() - t0)
        med = float(np.median(times)) / K
        print(f"{label:30s} {med * 1e3:7.3f}ms/app "
              f"({med / L * 1e6:6.2f}us/iter)  sum={float(out):.3e}",
              flush=True)
        return med

    def reps(body_once):
        """K applications per dispatch, inputs perturbed per rep."""
        def prog(key, *operands):
            def rep(acc, k):
                eps = 1.0 + 1e-6 * jax.random.uniform(
                    jax.random.fold_in(key, k), ())
                return acc + body_once(eps, *operands), 0
            acc, _ = jax.lax.scan(rep, jnp.float32(0), jnp.arange(K))
            return acc
        return prog

    # A: carry-only body
    def carry_only(eps, h0):
        def step(h, _):
            h = jnp.tanh(h * 0.99 + 0.01)
            return h, ()
        h, _ = jax.lax.scan(step, h0 * eps, None, length=L)
        return jnp.sum(h)

    # B: carry + n separate scanned arrays
    def with_inputs(n):
        def f(eps, h0, *xs_n):
            def step(h, inp):
                s = h * 0.99
                for x in inp:
                    s = s + jnp.sum(x, axis=-1, keepdims=True) * 1e-3
                return jnp.tanh(s), ()
            h, _ = jax.lax.scan(step, h0 * eps, tuple(xs_n))
            return jnp.sum(h)
        return f

    # C: same bytes, one concatenated array
    def concat_input(eps, h0, xcat):
        offs = np.cumsum([0] + widths)
        def step(h, inp):
            s = h * 0.99
            for a, b in zip(offs[:-1], offs[1:]):
                s = s + jnp.sum(inp[:, a:b], axis=-1, keepdims=True) * 1e-3
            return jnp.tanh(s), ()
        h, _ = jax.lax.scan(step, h0 * eps, xcat)
        return jnp.sum(h)

    # D: + a realistic matmul and stacked output
    def matmul_split(eps, h0, *xs_n):
        def step(h, inp):
            g = h @ W + inp[0]
            for x in inp[1:]:
                g = g + jnp.pad(x, ((0, 0), (0, 320 - x.shape[-1])))
            g = jax.nn.sigmoid(g)
            h = jnp.tanh(h * 0.95 + jnp.sum(g, -1, keepdims=True) * 1e-3)
            return h, g[:, :40]
        h, outs = jax.lax.scan(step, h0 * eps, tuple(xs_n))
        return jnp.sum(h) + jnp.sum(outs)

    def matmul_concat(eps, h0, xcat):
        offs = np.cumsum([0] + widths)
        def step(h, inp):
            g = h @ W + inp[:, :320]
            for a, b in zip(offs[1:-1], offs[2:]):
                g = g + jnp.pad(inp[:, a:b], ((0, 0), (0, 320 - (b - a))))
            g = jax.nn.sigmoid(g)
            h = jnp.tanh(h * 0.95 + jnp.sum(g, -1, keepdims=True) * 1e-3)
            return h, g[:, :40]
        h, outs = jax.lax.scan(step, h0 * eps, xcat)
        return jnp.sum(h) + jnp.sum(outs)

    sel = os.environ.get("OVH_VARIANTS",
                         "carry,in1,in6,cat,mm6,mmcat,gmm6,gmmcat").split(",")
    if "carry" in sel:
        timeit("A carry-only", reps(carry_only), h0)
    if "in1" in sel:
        timeit("B 1 input array", reps(with_inputs(1)), h0, xcat)
    if "in6" in sel:
        timeit("B 6 input arrays", reps(with_inputs(6)), h0, *xs)
    if "cat" in sel:
        timeit("C concat input", reps(concat_input), h0, xcat)
    if "mm6" in sel:
        timeit("D matmul 6 inputs", reps(matmul_split), h0, *xs)
    if "mmcat" in sel:
        timeit("D matmul concat", reps(matmul_concat), h0, xcat)

    def grad_of(f):
        def g(eps, h0, *ops):
            val, grads = jax.value_and_grad(
                lambda h: f(eps, h, *ops))(h0)
            return val + 0.0 * jnp.sum(grads)
        return g
    if "gmm6" in sel:
        timeit("E grad matmul 6 inputs", reps(grad_of(matmul_split)),
               h0, *xs)
    if "gmmcat" in sel:
        timeit("E grad matmul concat", reps(grad_of(matmul_concat)),
               h0, xcat)


if __name__ == "__main__":
    main()


