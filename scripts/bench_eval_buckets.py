"""Length-bucketed grouped-eval A/B (round 5; eval side of VERDICT r4 item 1).

Times the REAL eval surface — training/evaluator.run_weighted_eval, the
loop the trainer runs every epoch and `--only_test` runs at the end —
flat (one full-L program) vs length-bucketed (per-Lb programs, gated on
cfg.length_buckets).  The wall time of one run_weighted_eval call is an
honest measurement: phase 1 only enqueues, but the single bulk
jax.device_get at the end drains every dispatched step (CLAUDE.md
relay-mirage note), so call wall time = host batching + device work +
one download.

Data: expanding-history grouped eval file (1 pos + NG offline negatives
per impression, sequential_reviews.py:147-199 layout) at Taobao bench
dims via data/synthetic.py:write_synthetic_dataset — the same
short-skewed length distribution as the recorded bench
(docs/mask_density.jsonl).

Usage: python scripts/bench_eval_buckets.py [--ng 49] [--users 3000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ng", type=int, default=49)
    ap.add_argument("--users", type=int, default=3000)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--batch", type=int, default=512,
                    help="cfg.batch_size; eval groups per dispatch = "
                         "batch // (ng+1) — raise it to amortize the "
                         "dev-relay RTT (~25 ms/dispatch, CLAUDE.md)")
    ap.add_argument("--buckets", default="auto",
                    help="length_buckets for the bucketed arm "
                         "('auto' or comma edges, e.g. '16')")
    ap.add_argument("--groups_per_batch", type=int, default=None,
                    help="eval groups per dispatch (default "
                         "batch//(ng+1), the trainer's choice); raise "
                         "to amortize the ~25 ms/dispatch relay RTT")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step

    data_dir = os.path.join("/tmp", f"clsr_eval_bench_u{args.users}")
    if not os.path.exists(os.path.join(data_dir, "valid_data")):
        t0 = time.perf_counter()
        write_synthetic_dataset(data_dir, n_users=args.users,
                                n_items=20_000, n_cates=1_000,
                                valid_num_ngs=args.ng,
                                test_num_ngs=args.ng, seed=11)
        print(f"# dataset: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    vocabs = [load_vocab(os.path.join(data_dir, f"{n}_vocab.pkl"))
              for n in ("user", "item", "cate")]
    ds = parse_file(os.path.join(data_dir, "valid_data"), *vocabs)
    loader = SequenceLoader(ds, args.seq)
    lengths = loader.view.lengths
    n_groups = len(ds) // (args.ng + 1)
    anchors = np.arange(0, len(ds), args.ng + 1)
    al = np.minimum(lengths[anchors], args.seq)
    print(f"# {len(ds)} rows = {n_groups} groups x (1+{args.ng}); anchor "
          f"lengths mean {al.mean():.1f} median {int(np.median(al))} "
          f"max {al.max()} of L={args.seq}", file=sys.stderr)

    cfg = _taobao_cfg(batch_size=args.batch)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=len(vocabs[0]), n_items=len(vocabs[1]),
        n_cates=len(vocabs[2]))
    from clsr_tpu.data.batch import Batch  # noqa: F401  (sample via loader)
    sample = next(loader.train_batches(cfg.batch_size,
                                       np.random.RandomState(0)))
    state = create_train_state(model, cfg, sample)
    step = make_eval_step(model, cfg)

    from clsr_tpu.data.resident import resolve_bucket_paddings
    cfg_b = cfg.replace(length_buckets=args.buckets)
    pads = resolve_bucket_paddings(cfg_b, al)
    print(f"# bucket paddings ({args.buckets}): {pads}", file=sys.stderr)

    results = {}
    gpb = args.groups_per_batch
    for name, c in (("flat", cfg), ("bucketed", cfg_b)):
        t0 = time.perf_counter()
        res = run_weighted_eval(step, state, loader, c, num_ngs=args.ng,
                                batch_groups=gpb)
        print(f"# {name} warm+compile: {time.perf_counter()-t0:.1f}s "
              f"(wauc {res.get('wauc')})", file=sys.stderr)
        times = []
        for _ in range(args.calls):
            t0 = time.perf_counter()
            run_weighted_eval(step, state, loader, c, num_ngs=args.ng,
                              batch_groups=gpb)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        results[name] = med
        rows_s = len(ds) / med
        print(f"{name}: median {med*1e3:.1f} ms/epoch-eval = "
              f"{rows_s:,.0f} scored rows/s "
              f"({n_groups/med:,.0f} groups/s)  times="
              f"{[round(t*1e3) for t in times]}", flush=True)

    print(f"speedup bucketed vs flat: "
          f"{results['flat']/results['bucketed']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
