"""Statistical check: on-device negatives follow the in-batch item
frequency distribution (the reference's sampling law,
sequential_iterator.py:396-412)."""

import jax
import numpy as np

from clsr_tpu.training.negative_sampling import sample_in_batch_negatives


def test_negative_frequencies_match_batch_frequencies():
    # batch where item 7 appears 4x, item 3 appears 2x, others once
    items = np.array([7, 7, 7, 7, 3, 3, 1, 2, 4, 5], dtype=np.int32)
    cates = items % 5
    valid = np.ones(len(items), np.float32)

    counts = {}
    n_draws = 0
    for seed in range(200):
        neg_i, _ = sample_in_batch_negatives(
            jax.random.PRNGKey(seed), items, cates, valid, num_ngs=4)
        neg_i = np.asarray(neg_i)
        # exclude rows whose own positive is the item in question: a row's
        # negatives exclude its own item, so count draws per (row, item)
        for r in range(len(items)):
            for v in neg_i[r]:
                counts[int(v)] = counts.get(int(v), 0) + 1
                n_draws += 1

    # expected for item k as a NEGATIVE for row r: proportional to its
    # batch frequency, renormalized per row over items != items[r].
    # Aggregate expectation across rows:
    batch_freq = {int(v): int((items == v).sum()) for v in set(items)}
    expected = {k: 0.0 for k in batch_freq}
    B = len(items)
    for r in range(B):
        denom = B - batch_freq[int(items[r])]
        for k, c in batch_freq.items():
            if k != int(items[r]):
                expected[k] += 4 * c / denom
    total_exp = sum(expected.values())
    for k in batch_freq:
        got = counts.get(k, 0) / n_draws
        want = expected[k] / total_exp
        assert abs(got - want) < 0.02, (k, got, want)


def test_valid_prefix_only():
    # padding rows (valid=0 suffix) must never be sampled from
    items = np.array([1, 2, 3, 4, 99, 99], dtype=np.int32)
    cates = np.ones_like(items)
    valid = np.array([1, 1, 1, 1, 0, 0], np.float32)
    for seed in range(20):
        neg_i, _ = sample_in_batch_negatives(
            jax.random.PRNGKey(seed), items, cates, valid, num_ngs=3)
        assert 99 not in np.asarray(neg_i)
