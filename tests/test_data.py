"""Data layer: parsing, time features, padded views, grouped eval batches."""

import numpy as np
import pytest

from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import (ParsedDataset, compute_time_features,
                                  parse_file, time_range_for_unit)
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import Vocab, load_vocab


def _ref_time_features(ts, cur, time_range):
    """Literal per-element transcription of sequential_iterator.py:124-150."""
    time_diff = []
    for i in range(len(ts) - 1):
        time_diff.append(max((ts[i + 1] - ts[i]) / time_range, 0.5))
    time_diff.append(max((cur - ts[-1]) / time_range, 0.5))
    time_diff = np.log(time_diff)

    first = ts[0]
    tff = [max((t - first) / time_range, 0.5) for t in ts[1:]]
    tff.append(max((cur - first) / time_range, 0.5))
    tff = np.log(tff)

    ttn = np.log([max((cur - t) / time_range, 0.5) for t in ts])
    return time_diff, tff, ttn


@pytest.mark.parametrize("unit,expected", [("s", 86.4), ("ms", 86400000.0)])
def test_time_range_quirk(unit, expected):
    assert time_range_for_unit(unit) == expected


def test_time_features_match_reference(rng):
    for n in (1, 2, 5, 50):
        ts = np.sort(rng.randint(0, 10**6, n)).astype(float)
        cur = float(ts[-1] + rng.randint(0, 10**5))
        for unit in ("s", "ms"):
            tr = time_range_for_unit(unit)
            got = compute_time_features(ts, cur, tr)
            want = _ref_time_features(list(ts), cur, tr)
            for g, w in zip(got, want):
                np.testing.assert_allclose(g, w, rtol=1e-6)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    paths = write_synthetic_dataset(str(out), n_users=20, n_items=50,
                                    n_cates=8, test_num_ngs=9)
    vocabs = (load_vocab(paths["user_vocab"]), load_vocab(paths["item_vocab"]),
              load_vocab(paths["cate_vocab"]))
    return paths, vocabs


def test_parse_file_roundtrip(dataset):
    paths, (uv, iv, cv) = dataset
    ds = parse_file(paths["train"], uv, iv, cv, time_unit="s")
    assert len(ds) > 0
    assert np.all(ds.labels == 1)  # train files carry positives only
    assert ds.offsets[-1] == len(ds.hist_items)
    # first line sanity: history increasing length per user
    lengths = ds.seq_lengths()
    assert lengths.min() >= 1


def test_oov_maps_to_zero():
    v = Vocab({"default": 0, "a": 1})
    assert v.lookup("missing") == 0
    assert v.lookup_many(["a", "zz"]) == [1, 0]


def test_padded_view_left_truncates(dataset):
    paths, (uv, iv, cv) = dataset
    ds = parse_file(paths["train"], uv, iv, cv)
    L = 5
    loader = SequenceLoader(ds, max_seq_length=L)
    v = loader.view
    for i in range(min(len(ds), 50)):
        lo, hi = ds.offsets[i], ds.offsets[i + 1]
        full = ds.hist_items[lo:hi]
        tl = min(len(full), L)
        np.testing.assert_array_equal(v.item_hist[i, :tl], full[-tl:])
        assert v.mask[i, :tl].sum() == tl
        assert v.mask[i, tl:].sum() == 0


def test_train_batches_fixed_shape(dataset):
    paths, (uv, iv, cv) = dataset
    ds = parse_file(paths["train"], uv, iv, cv)
    loader = SequenceLoader(ds, max_seq_length=10)
    B = 32
    seen = 0
    for b in loader.train_batches(B, np.random.RandomState(0)):
        assert b.users.shape == (B,)
        assert b.items.shape == (B, 1)
        assert b.item_hist.shape == (B, 10)
        seen += int(b.valid.sum())
    assert seen <= len(ds)
    assert seen >= len(ds) - 4  # only a <5-row trailing batch may drop


def test_eval_batches_grouped(dataset):
    paths, (uv, iv, cv) = dataset
    ds = parse_file(paths["test"], uv, iv, cv)
    G = 10  # 1 pos + 9 negs
    loader = SequenceLoader(ds, max_seq_length=10)
    batches = list(loader.eval_batches(group_size=G, batch_groups=8))
    rows = 0
    for b in batches:
        assert b.items.shape == (8, G)
        # column 0 is the positive
        nv = int(b.valid.sum())
        np.testing.assert_array_equal(b.labels[:nv, 0], 1)
        np.testing.assert_array_equal(b.labels[:nv, 1:], 0)
        rows += nv
    assert rows == len(ds) // G


def test_eval_group_shares_history(dataset):
    # offline negatives share the positive's user and history
    paths, (uv, iv, cv) = dataset
    ds = parse_file(paths["test"], uv, iv, cv)
    G = 10
    for g in range(min(5, len(ds) // G)):
        base = g * G
        for j in range(1, G):
            assert ds.users[base + j] == ds.users[base]
            np.testing.assert_array_equal(
                ds.hist_items[ds.offsets[base]:ds.offsets[base + 1]],
                ds.hist_items[ds.offsets[base + j]:ds.offsets[base + j + 1]],
            )


def test_train_batches_stacked_partial_tail_batch():
    """A partial (zero-padded) trailing batch must NOT be swallowed into
    a [K, B] stack: with n=55, B=16, K=2 the epoch is 3 full batches +
    one padded batch (ceil=4); the old layout put the padded batch into
    the second K-stack and the slice ran past the epoch buffer
    (ValueError: cannot reshape).  Full batches stack; the partial takes
    the single-step tail path; rows and order match train_batches."""
    import numpy as np

    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import ParsedDataset

    B, K, L, hl = 16, 2, 4, 2
    n = B * 3 + 7
    pd = ParsedDataset(
        labels=np.ones(n, np.float32),
        users=(np.arange(n) % 5).astype(np.int32),
        items=(np.arange(n) % 7).astype(np.int32),
        cates=(np.arange(n) % 3).astype(np.int32),
        times=np.arange(n, dtype=np.float64),
        offsets=(np.arange(n + 1) * hl).astype(np.int64),
        hist_items=np.ones(n * hl, np.int32),
        hist_cates=np.ones(n * hl, np.int32),
        time_diff=np.full(n * hl, 0.5, np.float32),
        time_from_first=np.full(n * hl, 0.5, np.float32),
        time_to_now=np.full(n * hl, 0.5, np.float32),
    )
    ld = SequenceLoader(pd, L)
    items = list(ld.train_batches_stacked(B, K, np.random.RandomState(0)))
    stacked = [b for b in items if b.users.ndim == 2]
    single = [b for b in items if b.users.ndim == 1]
    assert len(stacked) == 1 and len(single) == 2
    rows = (sum(b.users.shape[0] * b.users.shape[1] for b in stacked)
            + sum(int(b.valid.sum()) for b in single))
    assert rows == n
    flat = []
    for b in ld.train_batches(B, np.random.RandomState(0)):
        flat.extend(np.asarray(b.users)[np.asarray(b.valid) > 0].tolist())
    flat2 = []
    for b in items:
        u = np.asarray(b.users).reshape(-1)
        v = np.asarray(np.broadcast_to(b.valid, b.users.shape)).reshape(-1)
        flat2.extend(u[v > 0].tolist())
    assert flat == flat2
