"""Owner-bucket occupancy under contiguous vs interleaved row layout
(VERDICT r3 item 3b's "measured bucket-occupancy table").

Simulates the owner-routed merge's per-device bucketing
(lazy_adam.compact_table_update_mesh_owner): draw a per-device id
stream from a zipf over a FREQUENCY-ORDERED vocab (the ETL assigns ids
by descending count, sequential_reviews.py — so low ids are hot),
dedup to unique runs like step 1 of the merge, and count runs per
owning shard under both owner functions (parallel/rowmap.py):

  contiguous   owner = id // (N/m)   — the hot prefix all lands in
                                       shard 0's bucket
  interleaved  owner = id % m        — any hot prefix spreads within
                                       +-1 row per shard

Occupancy is reported relative to capacity C = ceil(f * Mi / m); a
max/C above 1.0 means overflow (lossless broadcast fallback, or drops
under mesh_owner_overflow='drop').

Usage: python scripts/owner_occupancy.py [--md]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from clsr_tpu.parallel.rowmap import owner_local

CASES = [
    # name, N (table rows), Mi (per-device occurrence ids), zipf a
    ("taobao item, B=512/d", 100_000, 28_160, 1.2),
    ("kuaishou item, B=256/d", 500_000, 65_280, 1.2),
    ("kuaishou cate, B=256/d", 2_000, 65_280, 1.2),
]


def occupancy(N, Mi, a, m, f, seed=0):
    rng = np.random.RandomState(seed)
    ids = np.minimum(rng.zipf(a, size=Mi) - 1, N - 1)
    uniq = np.unique(ids)                     # the merge's local runs
    C = max(1, min(Mi, -(-int(f * Mi) // m)))
    rows = N // m
    out = {}
    for name, il in (("contiguous", False), ("interleaved", True)):
        own, _ = owner_local(uniq, m, rows, il)
        cnt = np.bincount(own, minlength=m)
        out[name] = (cnt, C)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--capacity", type=float, default=4.0)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()
    m, f = args.m, args.capacity

    sep = "|" if args.md else "  "
    print(f"m={m} shards, capacity_factor={f} "
          f"(C = ceil(f*Mi/m) slots per owner bucket)\n")
    hdr = ["case", "layout", "runs", "max/shard", "mean/shard",
           "max/C", "overflow?"]
    print(sep.join(hdr))
    if args.md:
        print("|".join(["---"] * len(hdr)))
    for name, N, Mi, a in CASES:
        for layout, (cnt, C) in occupancy(N, Mi, a, m, f).items():
            row = [name, layout, str(cnt.sum()), str(cnt.max()),
                   f"{cnt.mean():.0f}", f"{cnt.max() / C:.2f}",
                   "YES" if cnt.max() > C else "no"]
            print(sep.join(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
