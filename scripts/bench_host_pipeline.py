"""Host input-pipeline throughput (no device involved).

Measures the host-side cost of feeding training, the bottleneck VERDICT
round 1 flagged (device ~7-10M ex/s vs 1.35M ex/s host assembly):

  1. per-batch fancy-index assembly (SequenceLoader.train_batches — the
     round-1 path),
  2. epoch-permute-once + zero-copy stacked views
     (SequenceLoader.train_batches_stacked — the round-2 streaming path),
  3. ResidentDataset steady state (per-epoch np permutation only; the
     batch gather runs on device).

Run: python scripts/bench_host_pipeline.py [--rows 500000] [--seq 50]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def synth_parsed(n_rows: int, seq: int, n_items=100_000, n_cates=5_000,
                 n_users=50_000, seed=0):
    """Build a ParsedDataset directly (no file IO) at Taobao-like dims."""
    from clsr_tpu.data.parser import ParsedDataset
    rng = np.random.RandomState(seed)
    lengths = rng.randint(1, seq + 1, size=n_rows)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    total = int(offsets[-1])
    return ParsedDataset(
        labels=np.ones(n_rows, np.float32),
        users=rng.randint(0, n_users, n_rows).astype(np.int32),
        items=rng.randint(1, n_items, n_rows).astype(np.int32),
        cates=rng.randint(1, n_cates, n_rows).astype(np.int32),
        times=np.full(n_rows, 1.5e9),
        offsets=offsets,
        hist_items=rng.randint(1, n_items, total).astype(np.int32),
        hist_cates=rng.randint(1, n_cates, total).astype(np.int32),
        time_diff=rng.rand(total).astype(np.float32),
        time_from_first=rng.rand(total).astype(np.float32),
        time_to_now=rng.rand(total).astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--seq", type=int, default=50)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    from clsr_tpu.data.loader import SequenceLoader

    ds = synth_parsed(args.rows, args.seq)
    t0 = time.perf_counter()
    loader = SequenceLoader(ds, args.seq)
    print(f"PaddedView build: {time.perf_counter()-t0:.2f}s "
          f"({args.rows/(time.perf_counter()-t0)/1e6:.2f}M rows/s)")

    def consume(it):
        n = 0
        for b in it:
            # touch the arrays like device_put would (force the view read)
            n += b.users.shape[-1] * (b.users.shape[0]
                                      if b.users.ndim == 2 else 1)
        return n

    t0 = time.perf_counter()
    n = consume(loader.train_batches(args.batch, np.random.RandomState(0)))
    dt = time.perf_counter() - t0
    print(f"per-batch assembly:   {n/dt/1e6:6.2f}M ex/s ({dt:.2f}s)")

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    n = consume(loader.train_batches_stacked(args.batch, args.k, rng))
    dt = time.perf_counter() - t0
    print(f"stacked (1st epoch):  {n/dt/1e6:6.2f}M ex/s ({dt:.2f}s, "
          f"incl. buffer alloc)")
    for tag in ("2nd", "3rd"):
        t0 = time.perf_counter()
        n = consume(loader.train_batches_stacked(args.batch, args.k, rng))
        dt = time.perf_counter() - t0
        print(f"stacked ({tag} epoch):  {n/dt/1e6:6.2f}M ex/s ({dt:.2f}s, "
              f"steady state)")

    # resident steady state: the host only permutes row ids per epoch
    from clsr_tpu.data.resident import epoch_permutation
    eligible = np.flatnonzero(loader.view.lengths >= 1)
    t0 = time.perf_counter()
    perm, n_use, n_calls, n_tail = epoch_permutation(
        eligible, np.random.RandomState(0), args.batch, args.k)
    dt = time.perf_counter() - t0
    print(f"resident (host side): {n_use/dt/1e6:6.2f}M ex/s ({dt*1e3:.1f}ms "
          f"per epoch of {n_use} rows)")


if __name__ == "__main__":
    main()
