"""K-steps-per-dispatch == K sequential single steps."""

import jax
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import (make_multi_train_step, make_train_step,
                                     stack_batches)
from tests.test_lazy_adam import _batch, L, B


def _cfg(**kw):
    base = dict(
        model_type="gru4rec", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=8,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        layer_sizes=(8,), activation=("relu",), seed=0)
    base.update(kw)
    return Config(**base).validate()


def test_multi_step_equals_sequential():
    n_items, n_cates, n_users = 30, 6, 20
    rng_np = np.random.RandomState(0)
    K = 4
    batches = [_batch(rng_np, n_items, n_cates, n_users) for _ in range(K)]
    cfg = _cfg()
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)

    state_a = create_train_state(model, cfg, batches[0])
    single = make_train_step(model, cfg, donate=False)
    rng = jax.random.PRNGKey(5)
    seq_losses = []
    for i, b in enumerate(batches):
        state_a, parts = single(state_a, b, jax.random.fold_in(rng, i))
        seq_losses.append(float(parts.loss))

    state_b = create_train_state(model, cfg, batches[0])
    multi = make_multi_train_step(model, cfg, K, donate=False)
    state_b, parts = multi(state_b, stack_batches(batches), rng)

    np.testing.assert_allclose(np.asarray(parts.loss), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multi_step_lazyadam():
    n_items, n_cates, n_users = 30, 6, 20
    rng_np = np.random.RandomState(1)
    K = 3
    batches = [_batch(rng_np, n_items, n_cates, n_users) for _ in range(K)]
    cfg = _cfg(optimizer="lazyadam")
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    state = create_train_state(model, cfg, batches[0])
    multi = make_multi_train_step(model, cfg, K, donate=False)
    state, parts = multi(state, stack_batches(batches), jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(parts.loss)))
    assert int(state.opt_state.count) == K
