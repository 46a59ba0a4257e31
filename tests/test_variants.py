"""Ablation parser variants (recent-k / shuffled history) and prefetch."""

import numpy as np

from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.prefetch import prefetch_to_device
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab


def _setup(tmp_path):
    paths = write_synthetic_dataset(str(tmp_path), n_users=15, n_items=40,
                                    n_cates=6)
    return paths, (load_vocab(paths["user_vocab"]),
                   load_vocab(paths["item_vocab"]),
                   load_vocab(paths["cate_vocab"]))


def test_recent_k_truncates_and_recomputes_features(tmp_path):
    paths, (uv, iv, cv) = _setup(tmp_path)
    full = parse_file(paths["train"], uv, iv, cv)
    recent = parse_file(paths["train"], uv, iv, cv, recent_k=3)
    assert np.all(recent.seq_lengths() <= 3)
    # the kept events are the LAST ones and time features are recomputed
    # from the truncated window (time_from_first differs when truncated)
    for i in range(len(full)):
        lo_f, hi_f = full.offsets[i], full.offsets[i + 1]
        lo_r, hi_r = recent.offsets[i], recent.offsets[i + 1]
        n = hi_r - lo_r
        np.testing.assert_array_equal(recent.hist_items[lo_r:hi_r],
                                      full.hist_items[hi_f - n:hi_f])
        # time_to_now unaffected by truncation (depends only on each event)
        np.testing.assert_allclose(recent.time_to_now[lo_r:hi_r],
                                   full.time_to_now[hi_f - n:hi_f])


def test_shuffle_permutes_items_not_times(tmp_path):
    paths, (uv, iv, cv) = _setup(tmp_path)
    base = parse_file(paths["train"], uv, iv, cv)
    shuf = parse_file(paths["train"], uv, iv, cv, shuffle_seed=7)
    changed = False
    for i in range(len(base)):
        lo, hi = base.offsets[i], base.offsets[i + 1]
        a = base.hist_items[lo:hi]
        b = shuf.hist_items[lo:hi]
        assert sorted(a) == sorted(b)       # permutation of same multiset
        if not np.array_equal(a, b):
            changed = True
        # times untouched (reference shuffles items/cates only)
        np.testing.assert_allclose(base.time_to_now[lo:hi],
                                   shuf.time_to_now[lo:hi])
    assert changed
    # deterministic given the seed
    shuf2 = parse_file(paths["train"], uv, iv, cv, shuffle_seed=7)
    np.testing.assert_array_equal(shuf.hist_items, shuf2.hist_items)


def test_prefetch_preserves_order_and_content(tmp_path):
    paths, (uv, iv, cv) = _setup(tmp_path)
    loader = SequenceLoader(parse_file(paths["train"], uv, iv, cv),
                            max_seq_length=6)
    direct = list(loader.train_batches(8, np.random.RandomState(0)))
    fetched = list(prefetch_to_device(
        loader.train_batches(8, np.random.RandomState(0)), depth=3))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(np.asarray(a.items),
                                      np.asarray(b.items))
        np.testing.assert_array_equal(np.asarray(a.mask),
                                      np.asarray(b.mask))


def test_prefetch_propagates_errors():
    def bad_iter():
        yield {"x": np.zeros(3)}
        raise RuntimeError("boom")

    import pytest
    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad_iter(), depth=2))
