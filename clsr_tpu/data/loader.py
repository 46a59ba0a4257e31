"""Host-side batching.

Replaces the reference's per-batch Python/numpy assembly
(sequential_iterator.py:194-503) with a vectorized, pad-once design:

  * The whole dataset is padded/left-truncated to [N, max_seq_length] ONCE
    (vectorized scatter); per-epoch batching is pure fancy-indexing.  The
    reference re-pads every batch of every epoch row-by-row
    (sequential_iterator.py:372-394).
  * Train batches carry only the B positive rows (G=1); in-batch negative
    sampling runs on-device inside the jitted train step (see
    clsr_tpu/training/negative_sampling.py), replacing the host-side
    rejection loop (sequential_iterator.py:396-412) and cutting host->HBM
    traffic by (1+num_ngs)x.
  * Eval batches group each (1 positive + num_ngs negative) run of file rows
    into ONE row with G targets — the offline-sampled negatives share the
    positive's user and history (sequential_reviews.py:147-199), so the
    encoders run once per group instead of once per row (100x less encoder
    work on the 1+99 test protocol).
  * Every batch has a static shape: the final partial batch is zero-padded
    and masked via Batch.valid (XLA compiles one program per shape).
  * Like the reference, a trailing train batch with fewer than
    `min_batch_rows`=5 real rows is dropped (sequential_iterator.py:338-339),
    and rows with history shorter than min_seq_length are skipped
    (sequential_iterator.py:245-246).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from clsr_tpu.data.batch import Batch
from clsr_tpu.data.parser import ParsedDataset

# epoch-gather worker pool (numpy fancy indexing releases the GIL; the
# gather is DRAM-bandwidth-bound and scales with cores)
_GATHER_POOL: Optional[ThreadPoolExecutor] = None


def _gather_pool() -> ThreadPoolExecutor:
    global _GATHER_POOL
    if _GATHER_POOL is None:
        _GATHER_POOL = ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 4))
    return _GATHER_POOL


class PaddedView:
    """Dense [N, L] padded view of a ParsedDataset (built once)."""

    def __init__(self, ds: ParsedDataset, max_seq_length: int):
        n = len(ds)
        L = max_seq_length
        lengths = np.diff(ds.offsets)
        tl = np.minimum(lengths, L).astype(np.int64)

        self.item_hist = np.zeros((n, L), dtype=np.int32)
        self.cate_hist = np.zeros((n, L), dtype=np.int32)
        self.time_diff = np.zeros((n, L), dtype=np.float32)
        self.time_from_first = np.zeros((n, L), dtype=np.float32)
        self.time_to_now = np.zeros((n, L), dtype=np.float32)
        self.mask = np.zeros((n, L), dtype=np.float32)

        total = int(tl.sum())
        if total:
            rows = np.repeat(np.arange(n), tl)
            excl = np.concatenate([[0], np.cumsum(tl)[:-1]])
            pos = np.arange(total) - np.repeat(excl, tl)
            # keep the LAST tl entries of each ragged row (left-truncate)
            start_flat = ds.offsets[1:] - tl
            flat_idx = np.repeat(start_flat, tl) + pos
            self.item_hist[rows, pos] = ds.hist_items[flat_idx]
            self.cate_hist[rows, pos] = ds.hist_cates[flat_idx]
            self.time_diff[rows, pos] = ds.time_diff[flat_idx]
            self.time_from_first[rows, pos] = ds.time_from_first[flat_idx]
            self.time_to_now[rows, pos] = ds.time_to_now[flat_idx]
            self.mask[rows, pos] = 1.0

        self.lengths = lengths
        self.users = ds.users
        self.items = ds.items
        self.cates = ds.cates
        self.labels = ds.labels


class SequenceLoader:
    """Batch iterator factory over a ParsedDataset."""

    def __init__(self, ds: ParsedDataset, max_seq_length: int,
                 min_batch_rows: int = 5, view=None):
        """`view` overrides the PaddedView built from `ds` — used by the
        packed-dataset path (data/packed.py:make_loader), whose views
        are constructed without a ParsedDataset intermediate."""
        self.ds = ds
        self.max_seq_length = max_seq_length
        self.min_batch_rows = min_batch_rows
        self.view = view if view is not None else PaddedView(ds, max_seq_length)
        self._stacked_bufs: list = [None, None]
        self._buf_flip = 0

    # -------------------------------------------------------------- train
    def train_batches(self, batch_rows: int, rng: np.random.RandomState,
                      min_seq_length: int = 1) -> Iterator[Batch]:
        """Shuffled batches of positive rows, G=1, fixed shape [batch_rows]."""
        v = self.view
        idx = np.flatnonzero(v.lengths >= min_seq_length)
        rng.shuffle(idx)
        for lo in range(0, len(idx), batch_rows):
            take = idx[lo:lo + batch_rows]
            n = len(take)
            if n < self.min_batch_rows:
                continue  # reference drops tiny trailing train batches
            yield self._make_batch(take, batch_rows, group=None)

    def _epoch_gather(self, take: np.ndarray) -> dict:
        """Gather the epoch permutation into (reused) contiguous buffers.

        Two buffer sets alternate across epochs so views handed to an
        in-flight prefetch queue are never overwritten by the next
        epoch's gather (the CPU backend aliases device_put sources).
        """
        v = self.view
        src = {
            "users": v.users, "items": v.items, "cates": v.cates,
            "labels": v.labels,
            "item_hist": v.item_hist, "cate_hist": v.cate_hist,
            "mask": v.mask, "time_diff": v.time_diff,
            "time_from_first": v.time_from_first,
            "time_to_now": v.time_to_now,
        }
        n = len(take)
        bufs = self._stacked_bufs[self._buf_flip]
        self._buf_flip ^= 1
        if bufs is None or len(next(iter(bufs.values()))) != n:
            bufs = {key: np.empty((n,) + arr.shape[1:],
                                  np.float32 if key == "labels"
                                  else arr.dtype)
                    for key, arr in src.items()}
            self._stacked_bufs[self._buf_flip ^ 1] = bufs

        pool = _gather_pool()
        jobs = []
        n_parts = pool._max_workers
        for key, arr in src.items():
            out = bufs[key]
            if arr.ndim == 1:
                jobs.append(pool.submit(
                    np.take, arr, take, 0, out, "clip"))
            else:
                # row-partition the big [N, L] gathers across workers
                for p in range(n_parts):
                    lo, hi = p * n // n_parts, (p + 1) * n // n_parts
                    jobs.append(pool.submit(
                        np.take, arr, take[lo:hi], 0, out[lo:hi], "clip"))
        for j in jobs:
            j.result()
        return {
            "users": bufs["users"],
            "items": bufs["items"][:, None],
            "cates": bufs["cates"][:, None],
            "labels": bufs["labels"][:, None],
            "item_hist": bufs["item_hist"],
            "cate_hist": bufs["cate_hist"],
            "mask": bufs["mask"],
            "time_diff": bufs["time_diff"],
            "time_from_first": bufs["time_from_first"],
            "time_to_now": bufs["time_to_now"],
        }

    def train_batches_stacked(self, batch_rows: int, steps_per_call: int,
                              rng: np.random.RandomState,
                              min_seq_length: int = 1) -> Iterator[Batch]:
        """Epoch-permute-once batching for the K-steps-per-dispatch path.

        The per-batch fancy-indexing of `train_batches` costs ~8 small
        gather kernels per batch on one thread (measured 1.35M ex/s, the
        round-1 host bottleneck).  Here the WHOLE epoch is gathered once
        into preallocated permuted buffers — multi-threaded (numpy
        releases the GIL; the gather is DRAM-bound and scales with cores)
        and double-buffered across epochs so steady state pays no page
        faults — and each yielded item is a zero-copy [K, B, ...]
        reshaped view (measured >10x the per-batch path,
        scripts/bench_host_pipeline.py).

        Yields [K, B, ...]-stacked Batches for whole dispatch groups, then
        plain [B, ...] Batches for the tail (distinguish by users.ndim).
        Row selection, shuffling and the <min_batch_rows trailing-batch
        drop are identical to `train_batches` (same RandomState
        consumption), so training is step-for-step equivalent.
        """
        v = self.view
        idx = np.flatnonzero(v.lengths >= min_seq_length)
        rng.shuffle(idx)
        n = len(idx)
        rem = n % batch_rows
        if rem and rem < self.min_batch_rows:
            n -= rem  # reference drops tiny trailing train batches
        if n == 0:
            return
        take = idx[:n].astype(np.int64)
        B, K = batch_rows, steps_per_call
        n_batches = -(-n // B)
        # only FULL batches may enter a [K, B] stack: the final partial
        # (zero-padded) batch must take the single-step tail path, else
        # the stack slice runs past the epoch buffer
        n_calls = (n // B) // K

        ep = self._epoch_gather(take)
        ones = np.ones(B, dtype=np.float32)
        for c in range(n_calls):
            lo = c * K * B
            yield Batch(
                valid=np.broadcast_to(ones, (K, B)),
                **{key: arr[lo:lo + K * B].reshape((K, B) + arr.shape[1:])
                   for key, arr in ep.items()})
        for b in range(n_calls * K, n_batches):
            lo = b * B
            take_n = min(B, n - lo)
            row = {key: arr[lo:lo + take_n] for key, arr in ep.items()}
            if take_n < B:
                row = {key: np.concatenate(
                    [arr, np.zeros((B - take_n,) + arr.shape[1:], arr.dtype)])
                    for key, arr in row.items()}
            valid = np.zeros(B, dtype=np.float32)
            valid[:take_n] = 1.0
            yield Batch(valid=valid, **row)

    # --------------------------------------------------------------- eval
    def eval_batches(self, group_size: int, batch_groups: int,
                     min_seq_length: int = 1,
                     paddings: Optional[list] = None) -> Iterator[Batch]:
        """Grouped eval batches: one row per (1 pos + num_ngs neg) group.

        File rows must arrive in whole groups of `group_size` with identical
        user/history inside each group (the offline sampler's layout).  With
        group_size == 1 every row is its own group (the predict path).

        `paddings` (ascending bucket paddings, see
        data/resident.py:resolve_bucket_paddings) turns on length-bucketed
        eval: groups are partitioned by the ANCHOR row's history length
        (the group's negatives share the anchor's history by the offline
        sampler's construction, sequential_reviews.py:147-199) and each
        bucket's batches carry only its Lb history columns — one compiled
        eval program per Lb, same grouped metrics (the metric assembly is
        order-invariant across groups).  Strict bucket boundaries keep
        column Lb-1 padding, preserving the reference's padded
        time_to_now[:, -1] fusion input (clsr.py:239-248).
        """
        v = self.view
        n_rows = len(v.labels)
        if n_rows % group_size != 0:
            raise ValueError(
                f"eval file rows ({n_rows}) not divisible by group size "
                f"({group_size})"
            )
        anchors = np.arange(0, n_rows, group_size)
        if min_seq_length > 1:
            anchors = anchors[v.lengths[anchors] >= min_seq_length]
        if paddings:
            from clsr_tpu.data.resident import bucket_rows
            L = v.item_hist.shape[1]
            for Lb, local in bucket_rows(v.lengths[anchors], L, paddings):
                sub = anchors[local]
                for lo in range(0, len(sub), batch_groups):
                    take = sub[lo:lo + batch_groups]
                    yield self._make_batch(take, batch_groups,
                                           group=group_size,
                                           Lb=None if Lb == L else Lb)
            return
        for lo in range(0, len(anchors), batch_groups):
            take = anchors[lo:lo + batch_groups]
            yield self._make_batch(take, batch_groups, group=group_size)

    # ------------------------------------------------------------ helpers
    def _make_batch(self, row_idx: np.ndarray, target_rows: int,
                    group: Optional[int], Lb: Optional[int] = None) -> Batch:
        """`Lb` column-slices the history fields to a bucket padding
        (rows must all have clamped length <= Lb - 1; see eval_batches)."""
        v = self.view
        n = len(row_idx)
        G = 1 if group is None else group
        cols = slice(None) if Lb is None else slice(0, Lb)

        def pad(arr):
            if n == target_rows:
                return arr
            shape = (target_rows - n,) + arr.shape[1:]
            return np.concatenate([arr, np.zeros(shape, dtype=arr.dtype)], 0)

        if group is None:
            items = v.items[row_idx][:, None]
            cates = v.cates[row_idx][:, None]
            labels = v.labels[row_idx][:, None]
        else:
            # group member g sits at file row anchor+g
            member = row_idx[:, None] + np.arange(G)[None, :]
            items = v.items[member]
            cates = v.cates[member]
            labels = v.labels[member]

        valid = np.zeros(target_rows, dtype=np.float32)
        valid[:n] = 1.0

        return Batch(
            users=pad(v.users[row_idx]),
            items=pad(items),
            cates=pad(cates),
            labels=pad(labels.astype(np.float32)),
            item_hist=pad(v.item_hist[row_idx][:, cols]),
            cate_hist=pad(v.cate_hist[row_idx][:, cols]),
            mask=pad(v.mask[row_idx][:, cols]),
            time_diff=pad(v.time_diff[row_idx][:, cols]),
            time_from_first=pad(v.time_from_first[row_idx][:, cols]),
            time_to_now=pad(v.time_to_now[row_idx][:, cols]),
            valid=valid,
        )
