"""Expanding-history generation throughput (data/etl.py).

VERDICT r1 item 9: >=10x line-generation throughput on a synthetic
10M-row input.  Measures the round-1-style per-line join loop, the
incremental-prefix single-process path, and the multiprocess path.

Run: python scripts/bench_etl.py [--rows 2000000] [--procs 4]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def synth_instances(n_rows: int, n_users: int, seed=0) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    users = np.sort(rng.randint(0, n_users, n_rows))
    t = 1_500_000_000 + rng.randint(0, 9 * 24 * 3600, n_rows)
    df = pd.DataFrame({
        "user_id": users,
        "item_id": rng.randint(1, 200_000, n_rows),
        "cate_id": rng.randint(1, 5_000, n_rows),
        "timestamp": np.sort(t),
    })
    return df.sort_values(["user_id", "timestamp"], kind="stable")


def legacy_generate(df, splits, outs_paths, subsample, rng):
    """The round-1 per-line ",".join(items[:k]) loop (for comparison)."""
    outs = {s: open(p, "w") for s, p in outs_paths.items()}
    try:
        d = df.assign(_split=splits.values)
        for uid, group in d.groupby("user_id", sort=False):
            items = group["item_id"].astype(str).tolist()
            cates = group["cate_id"].astype(str).tolist()
            times = group["timestamp"].astype(str).tolist()
            split_names = group["_split"].tolist()
            for k in range(1, len(items)):
                split = split_names[k]
                frac = subsample.get(split, 1.0)
                if frac < 1.0 and not rng.uniform() < frac:
                    continue
                outs[split].write("\t".join([
                    "1", str(uid), items[k], cates[k], times[k],
                    ",".join(items[:k]), ",".join(cates[:k]),
                    ",".join(times[:k]),
                ]) + "\n")
    finally:
        for f in outs.values():
            f.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--procs", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--skip_legacy", action="store_true",
                    help="skip the slow round-1 baseline (reuse its "
                         "known rate for the speedup column)")
    args = ap.parse_args()

    from clsr_tpu.data.etl import generate_expanding, split_global_time

    # ~40 events/user -> realistic history lengths
    df = synth_instances(args.rows, n_users=args.rows // 40)
    splits = split_global_time(df, 24 * 3600)
    subsample = {"train": 1.0, "valid": 0.2, "test": 0.2}
    tmp = tempfile.mkdtemp()
    paths = lambda tag: {s: os.path.join(tmp, f"{tag}_{s}") for s in
                         ("train", "valid", "test")}

    if args.skip_legacy:
        # measured rate from the recorded 1-2M-row runs (docs/RESULTS_r2)
        t_legacy, n_lines = None, None
    else:
        p = paths("legacy")
        t0 = time.perf_counter()
        legacy_generate(df, splits, p, subsample, np.random.RandomState(0))
        t_legacy = time.perf_counter() - t0
        n_lines = sum(sum(1 for _ in open(f)) for f in p.values())
        print(f"legacy join-per-line: {t_legacy:6.1f}s "
              f"({n_lines / t_legacy / 1e3:7.1f}k lines/s)")

    p = paths("incr")
    t0 = time.perf_counter()
    generate_expanding(df, splits, p["train"], p["valid"], p["test"],
                       subsample, rng=np.random.RandomState(0))
    t_incr = time.perf_counter() - t0
    if n_lines is None:
        n_lines = sum(sum(1 for _ in open(f)) for f in p.values())
        t_legacy = n_lines / 42_000  # round-1 measured ~42k lines/s
    print(f"incremental prefix:   {t_incr:6.1f}s "
          f"({n_lines / t_incr / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_incr:.1f}x")

    p = paths("native")
    t0 = time.perf_counter()
    generate_expanding(df, splits, p["train"], p["valid"], p["test"],
                       subsample, rng=np.random.RandomState(0),
                       engine="native")
    t_nat = time.perf_counter() - t0
    print(f"native C++:           {t_nat:6.1f}s "
          f"({n_lines / t_nat / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_nat:.1f}x")

    p = paths("mp")
    t0 = time.perf_counter()
    generate_expanding(df, splits, p["train"], p["valid"], p["test"],
                       subsample, rng=np.random.RandomState(0),
                       processes=args.procs)
    t_mp = time.perf_counter() - t0
    print(f"{args.procs}-process:            {t_mp:6.1f}s "
          f"({n_lines / t_mp / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_mp:.1f}x")

    # packed binary: the O(events) format (data/packed.py) — no TSV at
    # all; includes vocab construction + offline negative sampling,
    # which the TSV tiers above DON'T include
    from clsr_tpu.data.packed import build_packed
    t0 = time.perf_counter()
    pack, _ = build_packed(df, splits, subsample,
                           rng=np.random.RandomState(0),
                           valid_num_ngs=4, test_num_ngs=49)
    t_build = time.perf_counter() - t0
    pp = os.path.join(tmp, "packed.npz")
    t0 = time.perf_counter()
    pack.save(pp)
    t_save = time.perf_counter() - t0
    t_packed = t_build + t_save
    tsv_bytes = sum(os.path.getsize(f) for f in paths("incr").values())
    print(f"packed binary:        {t_packed:6.1f}s "
          f"({n_lines / t_packed / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_packed:.1f}x   [build {t_build:.1f}s + "
          f"save {t_save:.1f}s; {os.path.getsize(pp) / 1e6:.0f}MB vs "
          f"{tsv_bytes / 1e6:.0f}MB TSV; includes vocab+negatives]")


if __name__ == "__main__":
    main()
