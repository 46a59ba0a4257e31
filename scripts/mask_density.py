"""History-length / mask-density report (VERDICT r4 item 1a).

The training protocol pads every row to max_seq_length L and every scan
/ attention runs all L positions regardless of the row's real history
length (sequential_iterator.py:372-394 truncation; expanding-history
generation sequential_reviews.py:358-438 makes short prefixes
structurally dominant).  This script publishes the fact: per-dataset
history-length distribution and mask density (= fraction of scan
iterations / attention positions that are REAL work), plus what 2-3
length buckets would execute (the length-aware batching lever).

Usage:
  python scripts/mask_density.py                  # bench + drift sets
  python scripts/mask_density.py --edges 16,50
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(name: str, lengths: np.ndarray, L: int, edges):
    tl = np.minimum(lengths, L)          # the padded/truncated lengths
    density = tl.sum() / (len(tl) * L)
    row = {
        "dataset": name, "rows": int(len(tl)), "L": L,
        "mean": round(float(tl.mean()), 2),
        "median": int(np.median(tl)),
        "p90": int(np.percentile(tl, 90)),
        "max": int(tl.max()),
        "mask_density": round(float(density), 4),
        "padding_frac": round(float(1 - density), 4),
    }
    # what length-bucketed execution would run: rows with tl <= e-1 pad
    # to e (strict boundary keeps the reference's padded time_to_now[:,L-1]
    # quirk — clsr.py:239-248 — exactly 0 for every non-full row)
    es = [e for e in edges if e < L] + [L]
    executed = 0
    sizes = []
    lo = 0
    for e in es:
        hi = e - 1 if e < L else L
        n = int(((tl >= lo) & (tl <= hi)).sum())
        executed += n * e
        sizes.append({"bucket_L": e, "rows": n})
        lo = hi + 1
    row["buckets"] = sizes
    row["bucketed_iter_frac"] = round(executed / (len(tl) * L), 4)
    row["bucketed_speedup_bound"] = round(len(tl) * L / executed, 2)
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default="16")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    edges = [int(e) for e in args.edges.split(",") if e]

    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.vocab import load_vocab

    rows = []

    def from_dir(name, d, L, time_unit="s"):
        vocabs = [load_vocab(os.path.join(d, f"{n}_vocab.pkl"))
                  for n in ("user", "item", "cate")]
        ds = parse_file(os.path.join(d, "train_data"), *vocabs,
                        time_unit=time_unit)
        lengths = np.diff(ds.offsets)
        rows.append(report(name, lengths, L, edges))

    # 1. the bench dataset (the exact rows behind BENCH_r0*.json)
    bench_dir = os.path.join(tempfile.gettempdir(), "clsr_bench_data")
    if not os.path.exists(os.path.join(bench_dir, "train_data")):
        from clsr_tpu.data.synthetic import write_synthetic_dataset_fast
        write_synthetic_dataset_fast(bench_dir, n_users=8_000,
                                     n_items=100_000, n_cates=5_000)
    from_dir("bench_taobao_dims", bench_dir, 50)

    # 2/3. the drift-study populations the quality cells train on
    from clsr_tpu.data.synthetic import write_drift_dataset
    from quality_drift_study import SCALES
    for scale, L in (("taobao", 50), ("kuaishou", 250)):
        sc = SCALES[scale]
        d = os.path.join(tempfile.gettempdir(), f"mask_density_{scale}")
        if not os.path.exists(os.path.join(d, "train_data")):
            gen_keys = ("min_events", "max_events", "burst_len",
                        "alpha_low", "alpha_high", "alpha_bimodal")
            write_drift_dataset(
                d, n_users=sc["n_users"], n_items=sc["n_items"],
                n_cates=sc["n_cates"], valid_num_ngs=4, test_num_ngs=49,
                seed=3, **{k: sc[k] for k in gen_keys if k in sc})
        from_dir(f"drift_{scale}", d, L)

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
