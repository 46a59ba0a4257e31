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
    args = ap.parse_args()

    from clsr_tpu.data.etl import generate_expanding, split_global_time

    # ~40 events/user -> realistic history lengths
    df = synth_instances(args.rows, n_users=args.rows // 40)
    splits = split_global_time(df, 24 * 3600)
    subsample = {"train": 1.0, "valid": 0.2, "test": 0.2}
    tmp = tempfile.mkdtemp()
    paths = lambda tag: {s: os.path.join(tmp, f"{tag}_{s}") for s in
                         ("train", "valid", "test")}

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
    print(f"incremental prefix:   {t_incr:6.1f}s "
          f"({n_lines / t_incr / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_incr:.1f}x")

    p = paths("mp")
    t0 = time.perf_counter()
    generate_expanding(df, splits, p["train"], p["valid"], p["test"],
                       subsample, rng=np.random.RandomState(0),
                       processes=args.procs)
    t_mp = time.perf_counter() - t0
    print(f"{args.procs}-process:            {t_mp:6.1f}s "
          f"({n_lines / t_mp / 1e3:7.1f}k lines/s)  "
          f"{t_legacy / t_mp:.1f}x")


if __name__ == "__main__":
    main()
