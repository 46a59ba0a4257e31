"""Drift-synthetic generator (data/synthetic.py:make_drift_events).

The planted structure must actually be there: stable long-term category
prevalence across the whole history vs short-term bursts that change,
and the emitted dataset must parse and train.
"""

import collections
import json

import numpy as np

from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import make_drift_events, write_drift_dataset
from clsr_tpu.data.vocab import load_vocab


def test_planted_mixture_is_recoverable():
    """The share of a user's events falling in their top-2 whole-stream
    categories must track the planted long-term mixture alpha_u — the
    signal the fusion gate is supposed to learn."""
    events, item2cate, alphas = make_drift_events(
        n_users=200, n_items=300, n_cates=30, min_events=30, max_events=40,
        seed=0)
    shares, planted = [], []
    for u, (items, _) in events.items():
        cates = item2cate[items].tolist()
        top2 = {c for c, _ in collections.Counter(cates).most_common(2)}
        shares.append(np.mean([c in top2 for c in cates]))
        planted.append(alphas[u])
    shares, planted = np.asarray(shares), np.asarray(planted)
    # per-user share correlates with the planted alpha...
    assert np.corrcoef(shares, planted)[0, 1] > 0.5
    # ...and is close in level (top-2 share slightly overestimates alpha
    # because bursts can repeat inside a window)
    assert abs(shares.mean() - planted.mean()) < 0.15
    # histories are NOT single-category (bursts inject variety)
    n_seen = [len(set(item2cate[items].tolist()))
              for items, _ in events.values()]
    assert np.mean(n_seen) > 4


def test_write_drift_dataset_roundtrip(tmp_path):
    paths = write_drift_dataset(str(tmp_path), n_users=40, n_items=120,
                                n_cates=12, valid_num_ngs=2,
                                test_num_ngs=4, seed=1)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    train = parse_file(paths["train"], uv, iv, cv)
    test = parse_file(paths["test"], uv, iv, cv)
    assert len(train) > 100
    assert len(test) % 5 == 0            # whole 1+4 groups
    alphas = json.load(open(paths["alphas"]))
    assert len(alphas) == 40
    assert all(0.25 <= a <= 0.75 for a in alphas.values())
    # item ids consistent with their category blocks
    assert train.hist_items.max() <= 120
