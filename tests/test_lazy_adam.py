"""Lazy (sparse) Adam vs dense Adam.

When every table row is touched by every batch, LazyAdam must match dense
Adam exactly (the only semantic difference is moment decay on untouched
rows).  Also checks that untouched rows never move.
"""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step

L, B = 6, 16


def _batch(rng, n_items, n_cates, n_users):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, n_users, B).astype(np.int32),
        items=rng.randint(0, n_items, (B, 1)).astype(np.int32),
        cates=rng.randint(0, n_cates, (B, 1)).astype(np.int32),
        labels=np.ones((B, 1), np.float32),
        item_hist=(rng.randint(0, n_items, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(0, n_cates, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32),
    )


def _cfg(opt):
    return Config(
        model_type="gru4rec", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=8,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        layer_sizes=(8,), activation=("relu",), optimizer=opt, seed=0,
    ).validate()


def test_lazy_matches_dense_when_all_rows_touched():
    # tiny vocab (4 items, 3 cates) so every batch covers every row
    n_items, n_cates, n_users = 4, 3, 50
    rng_np = np.random.RandomState(0)
    batches = [_batch(rng_np, n_items, n_cates, n_users) for _ in range(5)]
    # force full coverage of item/cate tables in each batch
    for b in batches:
        b.item_hist[0, :4] = np.arange(4)
        b.cate_hist[0, :3] = np.arange(3)
        b.mask[0, :] = 1.0

    # 2 steps: beyond that, Adam's m/(sqrt(v)+eps) amplifies float
    # reduction-order noise (~1e-9) into visible divergence near
    # zero-crossing gradients
    results = {}
    for opt in ("adam", "lazyadam"):
        cfg = _cfg(opt)
        model = get_model_class("gru4rec")(
            cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
        state = create_train_state(model, cfg, batches[0])
        step = make_train_step(model, cfg, donate=False)
        rng = jax.random.PRNGKey(1)
        for i, b in enumerate(batches[:2]):
            state, parts = step(state, b, jax.random.fold_in(rng, i))
        results[opt] = state.params

    for key in ("item_embedding", "cate_embedding"):
        np.testing.assert_allclose(
            np.asarray(results["adam"][key]),
            np.asarray(results["lazyadam"][key]), atol=1e-6, err_msg=key)
    # dense layers also match (same flattened-adam path)
    a = jax.tree_util.tree_leaves(results["adam"])
    b = jax.tree_util.tree_leaves(results["lazyadam"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_lazy_leaves_untouched_rows_alone():
    n_items, n_cates, n_users = 100, 20, 50
    rng_np = np.random.RandomState(0)
    batch = _batch(rng_np, 10, 5, n_users)   # ids only in [0, 10)/[0, 5)
    cfg = _cfg("lazyadam")
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    state = create_train_state(model, cfg, batch)
    before = np.asarray(state.params["item_embedding"]).copy()
    step = make_train_step(model, cfg, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = np.asarray(state.params["item_embedding"])
    # rows >= 10 never touched (negatives come from batch positives < 10)
    np.testing.assert_array_equal(before[10:], after[10:])
    assert not np.allclose(before[:10], after[:10])


def test_lazyadam_rejected_for_lgn():
    with pytest.raises(ValueError, match="lazyadam"):
        Config(model_type="lgn", user_vocab="u", item_vocab="i",
               cate_vocab="c", optimizer="lazyadam",
               user_embedding_dim=40).validate()
