"""ScoringService throughput: scored candidates/sec on one chip.

End-to-end through the serving API (clsr_tpu/serving.py): host-side
request assembly (vocab lookups, time features, padding into shape
buckets) + device scoring.  Each request carries a real history and C
candidates; all C score in one encoder pass (grouped targets).

Run: python scripts/bench_serving.py [--users 64] [--cands 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=64)     # requests/dispatch
    ap.add_argument("--cands", type=int, default=100)    # candidates/request
    ap.add_argument("--hist", type=int, default=40)
    ap.add_argument("--calls", type=int, default=15)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.data.vocab import Vocab
    from clsr_tpu.serving import ScoreRequest, ScoringService

    n_users, n_items, n_cates = 50_000, 100_000, 5_000
    cfg = _taobao_cfg(batch_size=args.users)
    uv = Vocab({"default_user": 0,
                **{f"u{i}": i for i in range(1, n_users)}})
    iv = Vocab({"default_item": 0,
                **{f"i{i}": i for i in range(1, n_items)}})
    cv = Vocab({"default_cate": 0,
                **{f"c{i}": i for i in range(1, n_cates)}})
    svc = ScoringService(cfg, n_users, n_items, n_cates, uv, iv, cv,
                         batch_buckets=(args.users,),
                         cand_buckets=(args.cands,))

    rng = np.random.RandomState(0)
    t0 = 1_600_000_000

    def make_requests(seed):
        r = np.random.RandomState(seed)
        reqs = []
        for u in range(args.users):
            hist = r.randint(1, n_items, args.hist)
            cands = r.randint(1, n_items, args.cands)
            reqs.append(ScoreRequest(
                user=f"u{r.randint(1, n_users)}",
                hist_items=[f"i{i}" for i in hist],
                hist_cates=[f"c{1 + i % (n_cates - 1)}" for i in hist],
                hist_times=[t0 - 3600 * (args.hist - k)
                            for k in range(args.hist)],
                current_time=t0,
                cand_items=[f"i{c}" for c in cands],
                cand_cates=[f"c{1 + c % (n_cates - 1)}" for c in cands],
            ))
        return reqs

    svc.score(make_requests(123))   # warm compile
    svc.score(make_requests(124))

    times = []
    for c in range(args.calls):
        reqs = make_requests(200 + c)   # fresh content per call
        t = time.perf_counter()
        out = svc.score(reqs)
        times.append(time.perf_counter() - t)
        assert all(np.isfinite(s).all() for s in out)
    times.sort()
    dt = times[len(times) // 2]
    scored = args.users * args.cands
    print(f"{args.users} users x {args.cands} candidates (L={args.hist}): "
          f"{dt*1e3:.1f}ms/call -> {scored/dt/1e6:.2f}M scored "
          f"candidates/s (host assembly included)")


if __name__ == "__main__":
    main()
