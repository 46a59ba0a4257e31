"""Length-bucketed training A/B on the recorded-bench workload
(VERDICT r4 item 1: the measured mask density is 21.9% — mean history
10.96 of L=50, docs/mask_density.jsonl — so ~4/5 of every scan /
attention iteration is masked padding work).

Protocol: identical to bench.py (honest forced-sync dispatch, K steps
per dispatch via lax.scan, fresh rng + donated state + fresh offsets per
call, median of calls; CLAUDE.md relay rules).  Two arms on the SAME
parsed dataset and model config:

  flat      — the recorded-bench path: one resident dataset at L=50,
              K=128 steps/dispatch;
  bucketed  — data/resident.py:build_resident_buckets with
              cfg.length_buckets edges (default 'auto'), one compiled
              program per bucket padding Lb; per-bucket K_b =
              min(128, batches_b) so every call is a full scan.

Reported bucketed throughput is the epoch-rate combination
  ex/s = N_total / sum_b(rows_b / r_b),   r_b = B * K_b / t_b
(the time a full epoch spends in bucket b is rows_b / r_b), i.e. the
same full-call accounting bench.py uses for the flat arm.

Run: python scripts/bench_buckets.py            (TPU)
     BENCH_BUCKET_EDGES=16 python scripts/bench_buckets.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "512"))
KMAX = int(os.environ.get("BENCH_STEPS_PER_CALL", "128"))
WARMUP = 2
CALLS = 9


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.resident import (build_resident,
                                        build_resident_buckets,
                                        choose_bucket_edges,
                                        epoch_permutation,
                                        make_resident_multi_step)
    from clsr_tpu.data.synthetic import write_synthetic_dataset_fast
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.utils.device import force_sync_dispatch

    data_dir = os.path.join(tempfile.gettempdir(), "clsr_bench_data")
    if not os.path.exists(os.path.join(data_dir, "train_data")):
        write_synthetic_dataset_fast(data_dir, n_users=8_000,
                                     n_items=100_000, n_cates=5_000)
    vocabs = [load_vocab(os.path.join(data_dir, f"{n}_vocab.pkl"))
              for n in ("user", "item", "cate")]
    ds = parse_file(os.path.join(data_dir, "train_data"), *vocabs,
                    time_unit="s")
    loader = SequenceLoader(ds, 50)
    view = loader.view

    cfg = _taobao_cfg(batch_size=BATCH, optimizer="lazyadam",
                      train_steps_per_call=KMAX)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=len(vocabs[0]), n_items=len(vocabs[1]),
        n_cates=len(vocabs[2]))
    sample = next(loader.train_batches(BATCH, np.random.RandomState(0)))
    state = create_train_state(model, cfg, sample)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.RandomState(0)

    edges_env = os.environ.get("BENCH_BUCKET_EDGES", "auto")
    if edges_env == "auto":
        pads = choose_bucket_edges(view.lengths, 50,
                                   min_rows=max(1024, 2 * BATCH))
    else:
        from clsr_tpu.data.resident import _round_up8
        tl = np.minimum(view.lengths, 50)
        top = 50 if tl.max() >= 50 else min(50, _round_up8(tl.max() + 1))
        pads = [int(e) for e in edges_env.split(",") if int(e) < top] + [top]
    print(f"# bucket paddings: {pads}", file=sys.stderr)

    # ---- build all programs, then force sync, then time ----------------
    arms = {}

    # flat arm
    res_flat = build_resident(view)
    elig = np.flatnonzero(view.lengths >= 1)
    arms["flat"] = [dict(res=res_flat, elig=elig, K=KMAX,
                         rows=len(elig),
                         fn=make_resident_multi_step(model, cfg, KMAX))]

    # bucketed arm
    buckets = build_resident_buckets(view, pads)
    arm_b = []
    for res_b, rows_b in buckets:
        elig_b = np.flatnonzero(view.lengths[rows_b] >= 1)
        Kb = min(KMAX, max(1, len(elig_b) // BATCH))
        arm_b.append(dict(res=res_b, elig=elig_b, K=Kb,
                          rows=len(elig_b),
                          fn=make_resident_multi_step(model, cfg, Kb)))
        print(f"#   bucket L={res_b.seq_len} rows={len(elig_b)} K={Kb}",
              file=sys.stderr)
    arms["bucketed"] = arm_b

    def call_slots(b):
        while True:
            perm, n, n_calls, _ = epoch_permutation(
                b["elig"], np_rng, BATCH, b["K"])
            perm_dev = jax.device_put(perm)
            for c in range(max(n_calls, 1)):
                yield perm_dev, np.int32(n), np.int32(c * b["K"] * BATCH)

    for name, arm in arms.items():
        for b in arm:
            b["slots"] = call_slots(b)

    # compile + warm every program
    nonlocal_state = state
    t0 = time.perf_counter()
    for name, arm in arms.items():
        for b in arm:
            for _ in range(WARMUP):
                perm_dev, n, off = next(b["slots"])
                rng2 = jax.random.fold_in(rng, int(n) + b["K"])
                nonlocal_state, losses = b["fn"](
                    nonlocal_state, b["res"], perm_dev, n, off, rng2)
                jax.block_until_ready(losses.loss)
    print(f"# compile+warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    force_sync_dispatch()

    results = {}
    state_cur = nonlocal_state
    rng_i = 0
    for name, arm in arms.items():
        per_bucket = []
        for b in arm:
            times = []
            for _ in range(CALLS):
                perm_dev, n, off = next(b["slots"])
                rng_i += 1
                sub = jax.random.fold_in(rng, rng_i)
                t = time.perf_counter()
                state_cur, losses = b["fn"](
                    state_cur, b["res"], perm_dev, n, off, sub)
                jax.block_until_ready(losses.loss)
                times.append(time.perf_counter() - t)
            times.sort()
            t_med = times[len(times) // 2]
            rate = BATCH * b["K"] / t_med
            per_bucket.append(dict(L=b["res"].seq_len, K=b["K"],
                                   rows=b["rows"], t_ms=t_med * 1e3,
                                   rate=rate))
            print(f"# {name} L={b['res'].seq_len}: med "
                  f"{t_med*1e3:.2f}ms/call = {rate:,.0f} ex/s",
                  file=sys.stderr)
        total_rows = sum(b["rows"] for b in per_bucket)
        epoch_t = sum(b["rows"] / b["rate"] for b in per_bucket)
        results[name] = dict(examples_per_sec=total_rows / epoch_t,
                             per_bucket=per_bucket)

    flat = results["flat"]["examples_per_sec"]
    buck = results["bucketed"]["examples_per_sec"]
    print(json.dumps({
        "metric": "clsr_train_bucketed_vs_flat_1chip",
        "flat_ex_s": round(flat, 1),
        "bucketed_ex_s": round(buck, 1),
        "speedup": round(buck / flat, 3),
        "paddings": pads,
    }))


if __name__ == "__main__":
    sys.exit(main())
