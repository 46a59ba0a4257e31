"""Offline ETL: raw interaction logs -> train/valid/test TSVs + vocabs.

Reimplements the reference dataset builder
(reco_utils/dataset/sequential_reviews.py) with vectorized pandas:

  data_preprocessing (sequential_reviews.py:27-74) orchestrates:
    1. dataset main — taobao_main (:955-982): keep 'pv' events, dedup
       (uid,iid), drop items with multiple category ids (:936-943), clamp to
       2017-11-25..2017-12-03, downsample 5% of users (:946-952), 10-core
       filter on items then users (:815-828);
       kuaishou_main (:999-1041): column renames, dedup, 10-core on items,
       10-core on users counting only positive rows, keep positives.
    2. _create_instance (:592-630): per-user chronological label-1 lines
       joined with the item->category map ('default_cat' when missing).
    3. _get_sampled_data (:537-556): optional popularity-proportional item
       subsample.
    4. global-time split — taobao: test = last 24h, valid = previous 24h
       (:705-735); kuaishou: 12h windows in ms (:672-702).
    5. expanding-history generation (:358-438): every prefix of a user's
       stream becomes a line; valid/test lines subsampled at 20% (taobao)
       or all splits at 10% (kuaishou, :275-355).
    6. _create_vocab (:77-144): frequency-sorted, id 0 = default.
    7. _negative_sampling_offline (:147-199): per valid/test line, sample
       negatives uniformly from the full interaction list (= popularity-
       proportional), unique per line, != positive, category substituted.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from clsr_tpu.data.vocab import Vocab

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- filters

def filter_k_core(record: pd.DataFrame, k_core: int, filtered_column: str,
                  count_column: str) -> pd.DataFrame:
    """Keep rows whose `filtered_column` value appears >= k_core times
    (sequential_reviews.py:815-828)."""
    counts = record.groupby(filtered_column)[count_column].count()
    keep = counts[counts >= k_core].index
    return record[record[filtered_column].isin(keep)].reset_index(drop=True)


def filter_items_with_multiple_cids(record: pd.DataFrame) -> pd.DataFrame:
    """Drop items mapped to more than one category id (:936-943)."""
    n_cids = record[["iid", "category"]].drop_duplicates().groupby("iid").size()
    single = n_cids[n_cids == 1].index
    return record[record["iid"].isin(single)].reset_index(drop=True)


def downsample(record: pd.DataFrame, col: str, frac: float,
               rng: Optional[np.random.RandomState] = None) -> pd.DataFrame:
    """Keep a random `frac` of distinct `col` values (:946-952)."""
    values = record[col].drop_duplicates()
    sample = values.sample(frac=frac, random_state=rng)
    return record[record[col].isin(sample)].reset_index(drop=True)


# ----------------------------------------------------------- dataset mains

def taobao_main(reviews_file: str,
                rng: Optional[np.random.RandomState] = None
                ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """UserBehavior.csv -> (reviews[uid,iid,ts], meta[iid,category])
    (sequential_reviews.py:955-982)."""
    reviews = pd.read_csv(
        reviews_file, header=None,
        names=["uid", "iid", "category", "behavior", "ts"])
    reviews = reviews[reviews["behavior"] == "pv"]
    reviews = reviews.drop_duplicates(subset=["uid", "iid"])
    reviews = filter_items_with_multiple_cids(reviews)
    start_ts = int(datetime(2017, 11, 25, 0, 0, 0).timestamp())
    end_ts = int(datetime(2017, 12, 3, 23, 59, 59).timestamp())
    reviews = reviews[(reviews["ts"] >= start_ts) & (reviews["ts"] <= end_ts)]
    reviews = downsample(reviews, "uid", 0.05, rng)
    reviews = filter_k_core(reviews, 10, "iid", "uid")
    reviews = filter_k_core(reviews, 10, "uid", "iid")
    meta = reviews[["iid", "category"]].drop_duplicates()
    return reviews[["uid", "iid", "ts"]], meta


def kuaishou_main(reviews_file: str) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """kuaishou.csv -> (reviews, meta) (sequential_reviews.py:999-1041)."""
    reviews = pd.read_csv(reviews_file, header=0)
    reviews = reviews.rename(columns={
        "time_ms": "ts", "user_id": "uid", "photo_id": "iid",
        "photo_kmeans_cluster_id": "category"})
    reviews = reviews.drop_duplicates(subset=["uid", "iid"])
    reviews = filter_k_core(reviews, 10, "iid", "uid")
    # user 10-core counting only positive rows (:830-843, :1022)
    pos = reviews[reviews["effective_view"] == 1]
    counts = pos.groupby("uid")["iid"].count()
    keep = counts[counts >= 10].index
    reviews = reviews[reviews["uid"].isin(keep)]
    reviews = reviews[reviews["effective_view"] == 1].reset_index(drop=True)
    meta = reviews[["iid", "category"]].drop_duplicates()
    return reviews[["uid", "iid", "ts"]], meta


# ---------------------------------------------------------------- instances

def create_instances(reviews: pd.DataFrame, meta: pd.DataFrame
                     ) -> pd.DataFrame:
    """Per-user time-sorted label-1 instances with category joined
    (:592-630).  Columns: label, user_id, item_id, timestamp, cate_id."""
    item2cate = meta.set_index("iid")["category"]
    df = reviews.copy()
    df["cate_id"] = df["iid"].map(item2cate).fillna("default_cat")
    df = df.sort_values(["uid", "ts"], kind="stable")
    return pd.DataFrame({
        "label": 1, "user_id": df["uid"].values, "item_id": df["iid"].values,
        "timestamp": df["ts"].values, "cate_id": df["cate_id"].values,
    })


def get_sampled_data(instances: pd.DataFrame, sample_rate: float,
                     rng: Optional[np.random.RandomState] = None
                     ) -> pd.DataFrame:
    """Popularity-proportional item subsample (:537-556)."""
    if sample_rate >= 1:
        return instances
    rng = rng or np.random.RandomState()
    items_with_popular = instances["item_id"].to_numpy()
    n_keep = int(instances["item_id"].nunique() * sample_rate)
    chosen: set = set()
    while len(chosen) < n_keep:
        chosen.add(items_with_popular[rng.randint(len(items_with_popular))])
    return instances[instances["item_id"].isin(chosen)].reset_index(drop=True)


# ------------------------------------------------------------------- split

def split_global_time(instances: pd.DataFrame, test_interval: float
                      ) -> pd.Series:
    """'train'/'valid'/'test' per row: test = last interval of global time,
    valid = the one before (:672-735)."""
    t_max = instances["timestamp"].max()
    test_split = t_max - test_interval
    valid_split = t_max - 2 * test_interval
    t = instances["timestamp"]
    return pd.Series(
        np.where(t < valid_split, "train",
                 np.where(t < test_split, "valid", "test")),
        index=instances.index)


# ----------------------------------------------------------- line generation

def _expand_user_lines(uid, items, cates, times, split_names, subsample,
                       min_sequence, rng, outs) -> None:
    """One user's expanding-history lines.

    History prefixes are built INCREMENTALLY (each step appends one
    token to the running join) instead of re-joining items[:k] per line
    — O(output chars) instead of O(E^2) re-scans.  The rng consumption
    order matches the original per-line loop exactly (one uniform per
    line whose split has frac < 1, in k order), so outputs are
    bit-identical for a given RandomState.
    """
    uid_s = str(uid)
    ih, ch, th = items[0], cates[0], times[0]
    for k in range(1, len(items)):
        split = split_names[k]
        frac = subsample.get(split, 1.0)
        keep = True
        if frac < 1.0:
            keep = rng.uniform() < frac
        if keep and k >= min_sequence:
            outs[split].write(
                f"1\t{uid_s}\t{items[k]}\t{cates[k]}\t{times[k]}\t"
                f"{ih}\t{ch}\t{th}\n")
        if k < len(items) - 1:
            ih = ih + "," + items[k]
            ch = ch + "," + cates[k]
            th = th + "," + times[k]


def _stringify_columns(df: pd.DataFrame):
    """ONE vectorized str conversion per column (the per-group
    .astype(str) was 85% of generation time), plus user row-range
    offsets (user blocks are contiguous in the instance stream)."""
    users = df["user_id"].to_numpy()
    items = df["item_id"].to_numpy().astype("U")
    cates = df["cate_id"].to_numpy().astype("U")
    times = df["timestamp"].to_numpy().astype("U")
    splitc = df["_split"].to_numpy()
    starts = np.flatnonzero(
        np.concatenate([[True], users[1:] != users[:-1]]))
    offsets = np.concatenate([starts, [len(users)]])
    return users, items, cates, times, splitc, offsets


def _expand_arrays(users, items, cates, times, splitc, offsets,
                   subsample, min_sequence, rng, outs) -> None:
    for gi in range(len(offsets) - 1):
        lo, hi = offsets[gi], offsets[gi + 1]
        _expand_user_lines(
            users[lo], items[lo:hi].tolist(), cates[lo:hi].tolist(),
            times[lo:hi].tolist(), splitc[lo:hi].tolist(), subsample,
            min_sequence, rng, outs)


def _expand_chunk(args) -> None:
    """Worker: expand a slice of users into private part files."""
    (pkl_path, part_paths, subsample, min_sequence, seed) = args
    import pickle

    with open(pkl_path, "rb") as f:
        df = pickle.load(f)
    rng = np.random.RandomState(seed)
    outs = {s: open(p, "w", buffering=1 << 20)
            for s, p in part_paths.items()}
    try:
        _expand_arrays(*_stringify_columns(df), subsample, min_sequence,
                       rng, outs)
    finally:
        for f in outs.values():
            f.close()


def _try_native_expand(df: pd.DataFrame, train_file: str, valid_file: str,
                       test_file: str, subsample: Dict[str, float],
                       min_sequence: int,
                       rng: Optional[np.random.RandomState]) -> Optional[int]:
    """Run the C++ line generator when ids/timestamps are numeric.

    Returns lines written, or None to fall back to the Python path
    (non-numeric ids, no compiler).  Subsample rng is mt19937 (native) —
    distribution identical to the numpy path, kept-line set differs;
    the train split (frac 1.0) is byte-identical.
    """
    try:
        from clsr_tpu import native
        if not native.available():
            return None
        cols = []
        for c in ("user_id", "item_id", "cate_id", "timestamp"):
            arr = df[c].to_numpy()
            a64 = arr.astype(np.int64)
            if not np.array_equal(a64, arr.astype(np.float64)
                                  if arr.dtype.kind == "f" else arr):
                return None  # lossy conversion
            cols.append(a64)
    except Exception:
        return None
    users = cols[0]
    starts = np.flatnonzero(
        np.concatenate([[True], users[1:] != users[:-1]]))
    offsets = np.concatenate([starts, [len(users)]]).astype(np.int64)
    split_idx = pd.Categorical(
        df["_split"], categories=["train", "valid", "test"]).codes \
        .astype(np.int8)
    sub3 = np.asarray([subsample.get(s, 1.0)
                       for s in ("train", "valid", "test")], np.float64)
    seed = int((rng or np.random.RandomState()).randint(0, 2 ** 63 - 1))
    return native.expand_lines_native(
        users, cols[1], cols[2], cols[3], split_idx, offsets, sub3,
        min_sequence, seed, train_file, valid_file, test_file)


def generate_expanding(instances: pd.DataFrame, splits: pd.Series,
                       train_file: str, valid_file: str, test_file: str,
                       subsample: Dict[str, float],
                       min_sequence: int = 1,
                       rng: Optional[np.random.RandomState] = None,
                       processes: int = 1,
                       engine: str = "python") -> None:
    """Expanding-history TSV generation (:358-438).

    For each user's chronological stream, every event beyond the first
    produces a line whose history is all PRIOR events; the line goes to the
    file given by the event's split.  `subsample[split]` keeps that fraction
    of candidate lines (reference: taobao valid/test 0.2; kuaishou all 0.1).
    History accumulates across splits (like the reference's single pass).

    `processes > 1` shards users across worker processes (each with its
    own subsample RandomState(seed+worker) — the kept-line SET differs
    from the single-process stream but the sampling distribution is
    identical); part files are concatenated in worker order.
    `engine='native'` runs the whole loop in C++ for numeric-id datasets
    (~6x; falls back to Python when ids are strings).
    """
    df = instances.assign(_split=splits.values)
    if engine == "native":
        n = _try_native_expand(df, train_file, valid_file, test_file,
                               subsample, min_sequence, rng)
        if n is not None:
            return
    if processes > 1:
        _generate_expanding_mp(df, train_file, valid_file, test_file,
                               subsample, min_sequence, rng, processes)
        return
    rng = rng or np.random.RandomState()
    outs = {"train": open(train_file, "w", buffering=1 << 20),
            "valid": open(valid_file, "w", buffering=1 << 20),
            "test": open(test_file, "w", buffering=1 << 20)}
    try:
        _expand_arrays(*_stringify_columns(df), subsample, min_sequence,
                       rng, outs)
    finally:
        for f in outs.values():
            f.close()


def _generate_expanding_mp(df: pd.DataFrame, train_file: str,
                           valid_file: str, test_file: str,
                           subsample: Dict[str, float], min_sequence: int,
                           rng: Optional[np.random.RandomState],
                           processes: int) -> None:
    import multiprocessing as mp
    import pickle
    import shutil
    import tempfile

    seed0 = int((rng or np.random.RandomState()).randint(0, 2 ** 31 - 1))
    users = df["user_id"].to_numpy()
    # user blocks are contiguous (instances sorted by (uid, ts)); chunk
    # at user boundaries into row ranges of roughly equal size
    starts = np.flatnonzero(
        np.concatenate([[True], users[1:] != users[:-1]]))
    cut_rows = np.linspace(0, len(users), processes + 1)[1:-1]
    cut_idx = np.searchsorted(starts, cut_rows)
    bounds = np.concatenate([[0], starts[cut_idx], [len(users)]])

    tmp = tempfile.mkdtemp(prefix="clsr_etl_")
    jobs = []
    for w in range(processes):
        lo, hi = int(bounds[w]), int(bounds[w + 1])
        if lo >= hi:
            continue
        pkl = os.path.join(tmp, f"chunk_{w}.pkl")
        with open(pkl, "wb") as f:
            pickle.dump(df.iloc[lo:hi], f)
        parts = {s: os.path.join(tmp, f"{s}_{w}.tsv")
                 for s in ("train", "valid", "test")}
        jobs.append((pkl, parts, subsample, min_sequence, seed0 + w))

    with mp.get_context("spawn").Pool(processes) as pool:
        pool.map(_expand_chunk, jobs)

    for split, path in (("train", train_file), ("valid", valid_file),
                        ("test", test_file)):
        with open(path, "w") as out:
            for job in jobs:
                with open(job[1][split]) as part:
                    shutil.copyfileobj(part, out, 1 << 22)
    shutil.rmtree(tmp, ignore_errors=True)


def generate_no_expanding(instances: pd.DataFrame, splits: pd.Series,
                          train_file: str, valid_file: str, test_file: str,
                          min_sequence: int = 1) -> None:
    """One line per user per split boundary (:441-523): the user's full
    history predicts their final event of the stream."""
    outs = {"train": open(train_file, "w"), "valid": open(valid_file, "w"),
            "test": open(test_file, "w")}
    try:
        df = instances.assign(_split=splits.values)
        for uid, group in df.groupby("user_id", sort=False):
            items = group["item_id"].astype(str).tolist()
            cates = group["cate_id"].astype(str).tolist()
            times = group["timestamp"].astype(str).tolist()
            split = group["_split"].tolist()[-1]
            if len(items) - 1 > min_sequence:
                outs[split].write("\t".join([
                    "1", str(uid), items[-1], cates[-1], times[-1],
                    ",".join(items[:-1]), ",".join(cates[:-1]),
                    ",".join(times[:-1]),
                ]) + "\n")
    finally:
        for f in outs.values():
            f.close()


# ------------------------------------------------------------------- vocab

def create_vocab(train_file: str, user_vocab: str, item_vocab: str,
                 cate_vocab: str) -> None:
    """Frequency-sorted vocabs from the TRAIN file only, id 0 = default
    (:77-144).  Counts cover target + history occurrences."""
    user_counts: Dict[str, int] = {}
    item_counts: Dict[str, int] = {}
    cate_counts: Dict[str, int] = {}
    with open(train_file) as f:
        for line in f:
            arr = line.rstrip("\n").split("\t")
            if len(arr) < 7:
                continue
            user_counts[arr[1]] = user_counts.get(arr[1], 0) + 1
            item_counts[arr[2]] = item_counts.get(arr[2], 0) + 1
            cate_counts[arr[3]] = cate_counts.get(arr[3], 0) + 1
            for m in arr[5].split(","):
                item_counts[m] = item_counts.get(m, 0) + 1
            for c in arr[6].split(","):
                cate_counts[c] = cate_counts.get(c, 0) + 1

    def freq_vocab(counts: Dict[str, int], default: str) -> Vocab:
        mapping = {default: 0}
        for i, (tok, _) in enumerate(
                sorted(counts.items(), key=lambda kv: kv[1], reverse=True)):
            mapping[tok] = i + 1
        return Vocab(mapping)

    freq_vocab(user_counts, "default_uid").save(user_vocab)
    freq_vocab(item_counts, "default_mid").save(item_vocab)
    freq_vocab(cate_counts, "default_cat").save(cate_vocab)


# ------------------------------------------------------- negative sampling

def negative_sampling_offline(instances: pd.DataFrame, valid_file: str,
                              test_file: str, valid_num_ngs: int = 4,
                              test_num_ngs: int = 49,
                              rng: Optional[np.random.RandomState] = None
                              ) -> None:
    """Append num_ngs popularity-sampled negative lines after each positive
    (:147-199): negatives unique per line, != positive, category replaced by
    the negative item's category."""
    rng = rng or np.random.RandomState()
    items_with_popular = instances["item_id"].astype(str).to_numpy()
    item2cate = dict(zip(instances["item_id"].astype(str),
                         instances["cate_id"].astype(str)))
    n_pool = len(items_with_popular)

    for path, num_ngs in ((valid_file, valid_num_ngs),
                          (test_file, test_num_ngs)):
        with open(path) as f:
            lines = f.readlines()
        with open(path, "w") as out:
            for line in lines:
                out.write(line)
                words = line.strip().split("\t")
                positive = words[2]
                neg_items: set = set()
                while len(neg_items) < num_ngs:
                    neg = items_with_popular[rng.randint(n_pool)]
                    if neg == positive or neg in neg_items:
                        continue
                    neg_items.add(neg)
                    words[0] = "0"
                    words[2] = neg
                    words[3] = item2cate[neg]
                    out.write("\t".join(words) + "\n")


# -------------------------------------------------------------- orchestrate

def data_preprocessing(reviews_file: str, train_file: str, valid_file: str,
                       test_file: str, user_vocab: str, item_vocab: str,
                       cate_vocab: str, sample_rate: float = 1.0,
                       valid_num_ngs: int = 4, test_num_ngs: int = 9,
                       dataset: str = "taobao",
                       is_history_expanding: bool = True,
                       seed: Optional[int] = None,
                       processes: int = 1,
                       engine: str = "python",
                       output_format: str = "tsv") -> None:
    """Full pipeline, mirroring sequential_reviews.py:27-74.

    `processes` > 1 parallelizes the expanding-history line generation;
    `engine='native'` runs it in C++ for numeric-id datasets (see
    generate_expanding).  `output_format='packed'` skips the O(events^2)
    TSV materialization entirely and writes the O(events) packed binary
    (data/packed.py) next to `train_file` as `packed.npz` — same kept
    lines and bit-identical vocabs for a given seed; negative sampling
    is distribution-equivalent (different rng stream)."""
    rng = np.random.RandomState(seed)
    if dataset == "taobao":
        reviews, meta = taobao_main(reviews_file, rng)
        test_interval = 24 * 60 * 60
        subsample = {"train": 1.0, "valid": 0.2, "test": 0.2}
    elif dataset == "kuaishou":
        reviews, meta = kuaishou_main(reviews_file)
        test_interval = 12 * 60 * 60 * 1000
        subsample = {"train": 0.1, "valid": 0.1, "test": 0.1}
    else:
        raise ValueError(f"unknown dataset {dataset}")

    instances = create_instances(reviews, meta)
    instances = get_sampled_data(instances, sample_rate, rng)
    splits = split_global_time(instances, test_interval)

    for path in (train_file, valid_file, test_file, user_vocab, item_vocab,
                 cate_vocab):
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)

    if output_format == "packed":
        if not is_history_expanding:
            raise ValueError(
                "output_format='packed' requires expanding histories")
        from clsr_tpu.data.packed import PACKED_FILENAME, build_packed
        pack, (uv, iv, cv) = build_packed(
            instances, splits, subsample, rng=rng,
            valid_num_ngs=valid_num_ngs, test_num_ngs=test_num_ngs)
        pack.save(os.path.join(os.path.dirname(train_file) or ".",
                               PACKED_FILENAME))
        uv.save(user_vocab)
        iv.save(item_vocab)
        cv.save(cate_vocab)
        return

    if is_history_expanding:
        generate_expanding(instances, splits, train_file, valid_file,
                           test_file, subsample, rng=rng,
                           processes=processes, engine=engine)
    else:
        generate_no_expanding(instances, splits, train_file, valid_file,
                              test_file)
    create_vocab(train_file, user_vocab, item_vocab, cate_vocab)
    negative_sampling_offline(instances, valid_file, test_file,
                              valid_num_ngs, test_num_ngs, rng)
