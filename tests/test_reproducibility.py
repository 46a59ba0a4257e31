"""Deterministic-seed reproducibility: same seed -> identical training."""

import jax
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch, L, B


def _run(seed):
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=3, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), seed=seed,
    ).validate()
    model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=40,
                                    n_cates=6)
    rng_np = np.random.RandomState(seed)
    batches = [_batch(rng_np, 40, 6, 20) for _ in range(3)]
    state = create_train_state(model, cfg, batches[0])
    step = make_train_step(model, cfg, donate=False)
    losses = []
    rng = jax.random.PRNGKey(seed)
    for i, b in enumerate(batches):
        state, parts = step(state, b, jax.random.fold_in(rng, i))
        losses.append(float(parts.loss))
    return losses, state.params


def test_same_seed_same_run():
    l1, p1 = _run(123)
    l2, p2 = _run(123)
    np.testing.assert_array_equal(l1, l2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_different_run():
    l1, _ = _run(123)
    l2, _ = _run(321)
    assert l1 != l2
