"""TSV parsing and time-feature computation.

Line format (reference sequential_iterator.py:90-103):
  label \t user \t item \t cate \t timestamp \t item_hist(,) \t cate_hist(,) \t ts_hist(,)

Time features reproduce sequential_iterator.py:119-150 verbatim, including
the `time_range` quirk: with second timestamps (taobao) deltas are divided
by 3600*24/1000 = 86.4 s, i.e. values are 1000x larger than "days"; with
millisecond timestamps (kuaishou) by 3600*24*1000 = one day.  All three
features are floored at 0.5 before the natural log.

For a history of length n and current time `cur`:
  time_diff[i]       = log(max((t[i+1]-t[i])/range, .5)),  last: cur - t[n-1]
  time_from_first[i] = log(max((t[i+1]-t[0])/range, .5)),  last: cur - t[0]
  time_to_now[i]     = log(max((cur - t[i])/range, .5))

Parsed rows are stored packed (flat arrays + offsets) so epochs shuffle an
index array instead of Python lists — the parse happens once per file and is
cached, like the reference's iter_data cache (sequential_iterator.py:220-224).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from clsr_tpu.data.vocab import Vocab


def _parse_file_native(path, user_vocab, item_vocab, cate_vocab,
                       time_range) -> Optional["ParsedDataset"]:
    """Parse via the C++ library (clsr_tpu/native) when it is buildable;
    returns None to fall back to the pure-Python path."""
    try:
        from clsr_tpu import native
        if not native.available():
            return None
        cache_key = (id(user_vocab), id(item_vocab), id(cate_vocab))
        nv = _native_vocab_cache.get(cache_key)
        if nv is None:
            nv = ((user_vocab, item_vocab, cate_vocab),  # keep refs alive
                  native.NativeVocab(user_vocab.mapping),
                  native.NativeVocab(item_vocab.mapping),
                  native.NativeVocab(cate_vocab.mapping))
            _native_vocab_cache[cache_key] = nv
        (labels, users, items, cates, times, offsets, hist_items,
         hist_cates, td, tff, ttn) = native.parse_file_native(
            path, nv[1], nv[2], nv[3], time_range)
        return ParsedDataset(
            labels=labels, users=users, items=items, cates=cates,
            times=times, offsets=offsets, hist_items=hist_items,
            hist_cates=hist_cates, time_diff=td, time_from_first=tff,
            time_to_now=ttn)
    except Exception:
        return None


_native_vocab_cache: dict = {}


def time_range_for_unit(time_unit: str) -> float:
    """The reference's normalizer (sequential_iterator.py:119-122)."""
    if time_unit == "ms":
        return 3600.0 * 24.0 * 1000.0
    return 3600.0 * 24.0 / 1000.0


@dataclasses.dataclass
class ParsedDataset:
    """Packed row storage: ragged histories as flat arrays + offsets."""

    labels: np.ndarray          # [N] float32
    users: np.ndarray           # [N] int32
    items: np.ndarray           # [N] int32
    cates: np.ndarray           # [N] int32
    times: np.ndarray           # [N] float64
    offsets: np.ndarray         # [N+1] int64 into the flat arrays
    hist_items: np.ndarray      # [total] int32
    hist_cates: np.ndarray      # [total] int32
    time_diff: np.ndarray       # [total] float32 (log-scaled)
    time_from_first: np.ndarray # [total] float32
    time_to_now: np.ndarray     # [total] float32

    def __len__(self) -> int:
        return len(self.labels)

    def seq_lengths(self) -> np.ndarray:
        return np.diff(self.offsets)


def compute_time_features(ts_hist: np.ndarray, current_time: float,
                          time_range: float):
    """Vectorized reproduction of sequential_iterator.py:124-150."""
    t = np.asarray(ts_hist, dtype=np.float64)
    n = len(t)
    diff = np.empty(n, dtype=np.float64)
    if n > 1:
        diff[:-1] = (t[1:] - t[:-1]) / time_range
    diff[-1] = (current_time - t[-1]) / time_range
    time_diff = np.log(np.maximum(diff, 0.5))

    from_first = np.empty(n, dtype=np.float64)
    if n > 1:
        from_first[:-1] = (t[1:] - t[0]) / time_range
    from_first[-1] = (current_time - t[0]) / time_range
    time_from_first = np.log(np.maximum(from_first, 0.5))

    to_now = np.log(np.maximum((current_time - t) / time_range, 0.5))
    return (time_diff.astype(np.float32),
            time_from_first.astype(np.float32),
            to_now.astype(np.float32))


def parse_file(path: str, user_vocab: Vocab, item_vocab: Vocab,
               cate_vocab: Vocab, time_unit: str = "s",
               col_sep: str = "\t", recent_k: Optional[int] = None,
               shuffle_seed: Optional[int] = None,
               use_native: bool = True) -> ParsedDataset:
    """Parse a train/valid/test TSV into a ParsedDataset.

    Ablation options mirroring the reference's iterator variants:
      * recent_k — keep only the last `recent_k` history events before
        computing time features (RecentSASequentialIterator,
        sequential_iterator.py:735-763, `counterfactual_recent_k`).
      * shuffle_seed — shuffle each line's item/cate history with a fixed
        per-user permutation seed; the TIME sequence is left in place, like
        the reference which shuffles only items/cates
        (ShuffleSASequentialIterator, sequential_iterator.py:766-793).
        Deviation: the reference reuses one permutation of the user's
        first-seen line for all their lines (and would crash on expanding
        histories of different lengths); here the permutation is drawn
        per line from a user-seeded RNG, which is well-defined for any mix
        of lengths.
    """
    time_range = time_range_for_unit(time_unit)

    if (use_native and col_sep == "\t" and recent_k is None
            and shuffle_seed is None):
        ds = _parse_file_native(path, user_vocab, item_vocab, cate_vocab,
                                time_range)
        if ds is not None:
            return ds

    labels, users, items, cates, times = [], [], [], [], []
    offsets = [0]
    hist_items_parts, hist_cates_parts = [], []
    td_parts, tff_parts, ttn_parts = [], [], []

    ulook, ilook, clook = user_vocab.lookup, item_vocab.lookup, cate_vocab.lookup
    ilook_many, clook_many = item_vocab.lookup_many, cate_vocab.lookup_many

    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cols = line.split(col_sep)
            labels.append(int(cols[0]))
            users.append(ulook(cols[1]))
            items.append(ilook(cols[2]))
            cates.append(clook(cols[3]))
            cur = float(cols[4])
            times.append(cur)

            hitems = ilook_many(cols[5].strip().split(","))
            hcates = clook_many(cols[6].strip().split(","))
            ts = np.array(cols[7].strip().split(","), dtype=np.float64)

            if recent_k is not None and len(hitems) > recent_k:
                hitems = hitems[-recent_k:]
                hcates = hcates[-recent_k:]
                ts = ts[-recent_k:]
            if shuffle_seed is not None:
                order = np.random.RandomState(
                    (shuffle_seed * 1_000_003 + users[-1]) % (2 ** 31)
                ).permutation(len(hitems))
                hitems = [hitems[i] for i in order]
                hcates = [hcates[i] for i in order]

            td, tff, ttn = compute_time_features(ts, cur, time_range)
            hist_items_parts.append(np.asarray(hitems, dtype=np.int32))
            hist_cates_parts.append(np.asarray(hcates, dtype=np.int32))
            td_parts.append(td)
            tff_parts.append(tff)
            ttn_parts.append(ttn)
            offsets.append(offsets[-1] + len(hitems))

    return ParsedDataset(
        labels=np.asarray(labels, dtype=np.float32),
        users=np.asarray(users, dtype=np.int32),
        items=np.asarray(items, dtype=np.int32),
        cates=np.asarray(cates, dtype=np.int32),
        times=np.asarray(times, dtype=np.float64),
        offsets=np.asarray(offsets, dtype=np.int64),
        hist_items=(np.concatenate(hist_items_parts)
                    if hist_items_parts else np.zeros(0, np.int32)),
        hist_cates=(np.concatenate(hist_cates_parts)
                    if hist_cates_parts else np.zeros(0, np.int32)),
        time_diff=(np.concatenate(td_parts)
                   if td_parts else np.zeros(0, np.float32)),
        time_from_first=(np.concatenate(tff_parts)
                         if tff_parts else np.zeros(0, np.float32)),
        time_to_now=(np.concatenate(ttn_parts)
                     if ttn_parts else np.zeros(0, np.float32)),
    )
