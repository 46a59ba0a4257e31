"""Honest micro-decomposition of the pmn compact row update (VERDICT r2
item 5: the update + backward are the largest Kuaishou stages; this
isolates each piece at the Kuaishou item-table shape and A/Bs the named
levers).

Pieces (M = B*(L+G) = 65,280 occurrence ids, N = 500k rows, D = 40,
pmn width 3D = 120):

  * run detection (first/seg cumsum from sorted ids)
  * run-sum segment_sum [M, D] (the current merge) vs cumsum-diff
    (prefix sums + per-run boundary gather) vs segment_sum at [M, 3D]
  * the one sorted [M, 3D] HBM gather / the one sorted+unique [M, 3D]
    scatter-set (the irreducible row traffic)
  * duplicated vs unique sorted gather streams (does HBM row cache make
    duplicate index entries cheap?) — zipf-ish duplication
  * Adam math alone on compact arrays

Protocol: bench_rowops.py's two-K chained-scan slope (cancels the
relay round-trip floor).  Usage: python scripts/bench_update_levers.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_LO, K_HI = 32, 128
M = 65_280
N = 500_000
D = 40


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--m", type=int, default=M)
    args = ap.parse_args()
    m = args.m

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
                out = body(jax.random.fold_in(key, k), *ops)
                return acc + jnp.sum(out).astype(jnp.float32), 0
            acc, _ = jax.lax.scan(sbody, jnp.float32(0), jnp.arange(K))
            return acc

        out = prog(jax.random.PRNGKey(0), *operands)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, args.calls + 1):
            t0 = time.perf_counter()
            out = prog(jax.random.PRNGKey(c), *operands)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def bench(label, body, *operands):
        t_lo = measure(K_LO, body, operands)
        t_hi = measure(K_HI, body, operands)
        per_app = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{label:52s} {per_app*1e6:9.1f} us/app "
              f"({per_app/m*1e9:6.2f} ns/row)", flush=True)
        return per_app

    def sorted_ids(key):
        return jnp.sort(jax.random.randint(key, (m,), 0, N))

    def zipf_sorted_ids(key):
        """Power-law ids (frequency-ordered vocab): heavy duplication in
        the head, like real item streams."""
        u = jax.random.uniform(key, (m,), minval=1e-6, maxval=1.0)
        ids = jnp.minimum((N * u ** 3.0).astype(jnp.int32), N - 1)
        return jnp.sort(ids)

    pmn = jnp.asarray(rng.randn(N, 3 * D).astype(np.float32) * 0.05)
    gw = jnp.asarray(rng.randn(m, D).astype(np.float32))
    w3 = jnp.asarray(rng.randn(m, 3 * D).astype(np.float32))

    bench("ids-gen baseline (randint+sort)",
          lambda key: sorted_ids(key).astype(jnp.float32))
    bench("zipf ids-gen baseline",
          lambda key: zipf_sorted_ids(key).astype(jnp.float32))

    def run_detect(key):
        ids = sorted_ids(key)
        first = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        return seg.astype(jnp.float32)

    bench("run detect (first/seg cumsum)", run_detect)

    def seg_and(key):
        ids = sorted_ids(key)
        first = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        return first, seg

    def segsum(key, g):
        _, seg = seg_and(key)
        return jax.ops.segment_sum(g, seg, num_segments=m,
                                   indices_are_sorted=True)

    bench("run-sum segment_sum [M,D]", segsum, gw)
    bench("run-sum segment_sum [M,3D]", segsum, w3)

    def cumsum_diff(key, g):
        first, seg = seg_and(key)
        idx_first = jax.ops.segment_min(
            jnp.arange(m, dtype=jnp.int32), seg, num_segments=m,
            indices_are_sorted=True)
        cs = jnp.cumsum(g, axis=0)
        # run r sums g[idx_first[r] .. idx_first[r+1]-1]
        nxt = jnp.concatenate([idx_first[1:], jnp.full((1,), m, jnp.int32)])
        safe_n = jnp.clip(nxt - 1, 0, m - 1)
        safe_f = jnp.clip(idx_first - 1, 0, m - 1)
        hi = cs[safe_n]
        lo = jnp.where((idx_first > 0)[:, None], cs[safe_f], 0.0)
        return hi - lo

    bench("run-sum via cumsum-diff [M,D]", cumsum_diff, gw)

    bench("sorted [M,3D] HBM gather (uniform dups)",
          lambda key, t: t.at[sorted_ids(key)]
          .get(indices_are_sorted=True), pmn)
    bench("sorted [M,3D] HBM gather (zipf dups)",
          lambda key, t: t.at[zipf_sorted_ids(key)]
          .get(indices_are_sorted=True), pmn)

    def unique_spread_ids(key):
        # m DISTINCT sorted ids spread over N (stride-ish): the
        # no-duplicate worst case for HBM row traffic
        base = jnp.arange(m, dtype=jnp.int32) * (N // m)
        off = jax.random.randint(key, (m,), 0, N // m)
        return base + off

    bench("sorted [M,3D] HBM gather (all-unique spread)",
          lambda key, t: t.at[unique_spread_ids(key)]
          .get(indices_are_sorted=True), pmn)

    bench("sorted+unique [M,3D] scatter-set",
          lambda key, r: jnp.zeros((N, 3 * D), jnp.float32)
          .at[sorted_ids(key)]
          .set(r, indices_are_sorted=True, unique_indices=True), w3)

    def adam_math(key, w):
        g = w[:, :D]
        mv = w[:, D:]
        m_new = 0.9 * mv[:, :D] + 0.1 * g
        v_new = 0.999 * mv[:, D:] + 0.001 * g * g
        step = 0.001 * m_new / (jnp.sqrt(v_new) + 1e-8)
        return jnp.concatenate([w[:, :D] - step, m_new, v_new], -1)

    bench("adam math alone [M,3D]", adam_math, w3)

    def clip_norm(key, g):
        norm = jnp.sqrt(jnp.sum(g * g))
        return g * jnp.where(norm > 0.5, 0.5 / norm, 1.0)

    bench("clip-by-norm alone [M,D]", clip_norm, gw)


if __name__ == "__main__":
    sys.exit(main())
