"""ScoringService benchmark: every millisecond attributed
(VERDICT r3 item 5).

Round 3 reported one end-to-end number (42-73 ms/call across sessions)
without separating device compute from the dev-relay round trip, and
never exercised AsyncScoringService.  This bench reports:

  (a) host assembly time (vocab lookups, time features, padding) —
      measured without any device dispatch;
  (b) device-only scoring time — two-point extraction: a K-batch
      lax.scan eval program scores K pre-assembled batches in ONE
      dispatch, so t(K) = RTT + K * t_dev and two K values give the
      slope (the honest per-batch device time) and the intercept (the
      relay RTT this session) — the same protocol as the train
      benches (CLAUDE.md);
  (c) end-to-end ScoringService.score latency (p50/p90/max over calls);
  (d) AsyncScoringService under N concurrent submitters: per-request
      p50/p99 latency, total scored candidates/s, and the dispatch
      count (micro-batching effectiveness: requests/dispatch);
  (e) batched-dispatch throughput: the K-scan program's per-batch cost
      = the sustained rate once dispatch latency is amortized (the
      multi-request pipeline bound).

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
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=10)
    ap.add_argument("--async_threads", type=int, default=8)
    ap.add_argument("--async_requests", type=int, default=160)
    ap.add_argument("--cpu", action="store_true",
                    help="functional smoke on CPU (numbers meaningless)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.data.vocab import Vocab
    from clsr_tpu.serving import (AsyncScoringService, ScoreRequest,
                                  ScoringService)
    from clsr_tpu.training.steps import make_eval_step_fn

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

    t0 = 1_600_000_000

    def make_requests(seed, n=None):
        r = np.random.RandomState(seed)
        reqs = []
        for u in range(n or args.users):
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

    # ---- (a) host assembly only (no dispatch) --------------------------
    reqs0 = make_requests(7)
    G = svc.cand_buckets[-1]
    t = time.perf_counter()
    N_AS = 5
    for k in range(N_AS):
        batch = svc._empty_batch(args.users, G)
        for row, rq in enumerate(reqs0):
            svc._fill_row(batch, row, rq, G)
    t_assembly = (time.perf_counter() - t) / N_AS
    print(f"(a) host assembly: {t_assembly*1e3:.1f} ms "
          f"({args.users} reqs x {args.cands} cands, L={args.hist})",
          flush=True)

    # ---- (b) device-only via K-scan two-point --------------------------
    raw_eval = make_eval_step_fn(svc.model, cfg)

    def scan_eval(state, batches):
        def body(_, b):
            preds, _a = raw_eval(state, b)
            return 0, preds
        _, preds = jax.lax.scan(body, 0, batches)
        return preds

    scan_jit = jax.jit(scan_eval)

    def stacked(K, seed):
        bs = []
        for k in range(K):
            b = svc._empty_batch(args.users, G)
            for row, rq in enumerate(make_requests(seed + k)):
                svc._fill_row(b, row, rq, G)
            bs.append(b)
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *bs)

    from clsr_tpu.utils.device import force_sync_dispatch
    for K in (args.k1, args.k2):       # compile both programs
        scan_jit(svc.state, stacked(K, 900)).block_until_ready()
    force_sync_dispatch()              # honest sync dispatch from here on

    def timed_scan(K, seed):
        b = stacked(K, seed)
        ts = []
        for c in range(5):
            t = time.perf_counter()
            scan_jit(svc.state, b).block_until_ready()
            ts.append(time.perf_counter() - t)
        return np.median(ts)

    t_k1 = timed_scan(args.k1, 1000)
    t_k2 = timed_scan(args.k2, 2000)
    t_dev = (t_k2 - t_k1) / (args.k2 - args.k1)
    t_rtt = t_k1 - args.k1 * t_dev
    scored = args.users * args.cands
    print(f"(b) device-only: {t_dev*1e3:.2f} ms/batch "
          f"({scored/t_dev/1e6:.1f}M cands/s device); "
          f"relay RTT intercept: {t_rtt*1e3:.1f} ms", flush=True)
    print(f"(e) batched-dispatch throughput (K={args.k2} scan): "
          f"{scored*args.k2/t_k2/1e6:.2f}M scored cands/s", flush=True)

    # ---- (c) end-to-end sync service latency ---------------------------
    svc.score(make_requests(123))   # warm the service program path
    lat = []
    for c in range(args.calls):
        reqs = make_requests(200 + c)
        t = time.perf_counter()
        out = svc.score(reqs)
        lat.append(time.perf_counter() - t)
        assert all(np.isfinite(s).all() for s in out)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p90 = lat[int(len(lat) * 0.9)]
    print(f"(c) sync e2e: p50 {p50*1e3:.1f} ms, p90 {p90*1e3:.1f} ms, "
          f"max {lat[-1]*1e3:.1f} ms -> {scored/p50/1e6:.2f}M cands/s; "
          f"attribution: assembly {t_assembly*1e3:.1f} + device "
          f"{t_dev*1e3:.1f} + RTT/dispatch {t_rtt*1e3:.1f} "
          f"= {(t_assembly + t_dev + t_rtt)*1e3:.1f} ms", flush=True)

    # ---- (d) async micro-batching under concurrency --------------------
    import threading

    asvc = AsyncScoringService(svc, max_wait_ms=3.0,
                               max_batch=args.users)
    reqs_all = make_requests(555, n=args.async_requests)
    lats = [None] * args.async_requests
    done = threading.Barrier(args.async_threads + 1)
    per = args.async_requests // args.async_threads

    def submitter(tid):
        for j in range(per):
            i = tid * per + j
            t = time.perf_counter()
            asvc.submit(reqs_all[i]).result()
            lats[i] = time.perf_counter() - t
        done.wait()

    t_start = time.perf_counter()
    for tid in range(args.async_threads):
        threading.Thread(target=submitter, args=(tid,),
                         daemon=True).start()
    done.wait()
    wall = time.perf_counter() - t_start
    asvc.close()
    ls = sorted(l for l in lats if l is not None)
    thru = args.async_requests * args.cands / wall
    print(f"(d) async ({args.async_threads} submitters x {per} reqs, "
          f"coalesce 3ms): req p50 {ls[len(ls)//2]*1e3:.1f} ms, "
          f"p99 {ls[int(len(ls)*0.99)]*1e3:.1f} ms; "
          f"{asvc.dispatches} dispatches "
          f"({args.async_requests/max(asvc.dispatches,1):.1f} reqs/"
          f"dispatch); {thru/1e6:.2f}M scored cands/s", flush=True)


if __name__ == "__main__":
    main()
