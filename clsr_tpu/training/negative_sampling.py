"""On-device in-batch negative sampling.

Replaces the reference's host-side rejection loop
(sequential_iterator.py:396-412): for each positive row, `num_ngs` negatives
are drawn uniformly from the batch's OTHER positive items (so the sampling
distribution is proportional to in-batch item frequency), rejecting draws
that equal the row's own positive item.

The rejection loop is re-expressed as a fixed number of vectorized resample
rounds: after `rounds` redraws the probability that a draw still collides is
p^rounds where p is the item's in-batch share — negligible for any real
batch.  A surviving collision keeps its (wrong-label) draw; the reference
would instead loop forever on a degenerate batch where every row shares one
item.

Runs inside the jitted train step, so the host ships only the B positive
rows — (1+num_ngs)x less host->HBM traffic than the reference's replicated
feed_dict.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch


def sample_in_batch_negatives(rng: jax.Array, items: jnp.ndarray,
                              cates: jnp.ndarray, valid: jnp.ndarray,
                              num_ngs: int, rounds: int = 8
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw [B, num_ngs] negative (item, cate) pairs from batch positives.

    `valid` marks real rows; padding rows sit in a suffix, so draws are
    restricted to [0, n_valid).  Padding rows still receive draws (their
    loss is masked out downstream).
    """
    B = items.shape[0]
    n_valid = jnp.maximum(valid.astype(jnp.int32).sum(), 1)

    keys = jax.random.split(rng, rounds)
    idx = jax.random.randint(keys[0], (B, num_ngs), 0, n_valid)
    for r in range(1, rounds):
        collide = items[idx] == items[:, None]
        fresh = jax.random.randint(keys[r], (B, num_ngs), 0, n_valid)
        idx = jnp.where(collide, fresh, idx)
    return items[idx], cates[idx]


def expand_nextitnet(rng: jax.Array, batch: Batch, num_ngs: int) -> Batch:
    """Per-position targets for NextItNet training.

    Mirrors NextItNetIterator._convert_data (nextitnet_iterator.py:100-215):
    with the history right-aligned, the positive target at position t is
    the NEXT history event (and the line's target item at the last
    position); negatives are drawn per position from the batch's line-level
    positive items, rejecting the position's own positive.  Labels are
    all-1 rows for the positive copy, all-0 for negatives — including
    padded positions, which the reference does not mask either.

    Returns a batch whose items/cates/labels have shape [B, G, L].
    """
    from clsr_tpu.models.nextitnet import right_align

    B, L = batch.item_hist.shape
    # right-aligned history (the reference iterator pads in front)
    hist_r = right_align(batch.item_hist[..., None],
                         batch.mask)[..., 0].astype(jnp.int32)
    cate_r = right_align(batch.cate_hist[..., None],
                         batch.mask)[..., 0].astype(jnp.int32)
    pos_items = jnp.concatenate(
        [hist_r[:, 1:], batch.items[:, :1]], axis=1)          # [B, L]
    pos_cates = jnp.concatenate(
        [cate_r[:, 1:], batch.cates[:, :1]], axis=1)

    line_items = batch.items[:, 0]
    line_cates = batch.cates[:, 0]
    n_valid = jnp.maximum(batch.valid.astype(jnp.int32).sum(), 1)
    rounds = 8
    keys = jax.random.split(rng, rounds)
    idx = jax.random.randint(keys[0], (B, num_ngs, L), 0, n_valid)
    for r in range(1, rounds):
        collide = line_items[idx] == pos_items[:, None, :]
        fresh = jax.random.randint(keys[r], (B, num_ngs, L), 0, n_valid)
        idx = jnp.where(collide, fresh, idx)
    neg_items = line_items[idx]                               # [B, n, L]
    neg_cates = line_cates[idx]

    items = jnp.concatenate([pos_items[:, None, :], neg_items], axis=1)
    cates = jnp.concatenate([pos_cates[:, None, :], neg_cates], axis=1)
    labels = jnp.zeros_like(items, jnp.float32).at[:, 0, :].set(1.0)
    return batch.replace(items=items, cates=cates, labels=labels)


def expand_with_negatives(rng: jax.Array, batch: Batch, num_ngs: int) -> Batch:
    """[B]-row positive batch -> grouped batch with G = 1 + num_ngs targets.

    Column 0 is the positive (labels [1, 0, ..., 0]), matching the
    reference's group layout (sequential_iterator.py:396-412)."""
    pos_items = batch.items[:, 0]
    pos_cates = batch.cates[:, 0]
    neg_items, neg_cates = sample_in_batch_negatives(
        rng, pos_items, pos_cates, batch.valid, num_ngs)
    items = jnp.concatenate([pos_items[:, None], neg_items], axis=1)
    cates = jnp.concatenate([pos_cates[:, None], neg_cates], axis=1)
    labels = jnp.zeros_like(items, dtype=jnp.float32).at[:, 0].set(1.0)
    return batch.replace(items=items, cates=cates, labels=labels)
