"""NextItNet per-position training protocol."""

import jax
import jax.numpy as jnp
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.models.nextitnet import right_align
from clsr_tpu.training.negative_sampling import expand_nextitnet
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch, L, B


def _cfg(**kw):
    base = dict(
        model_type="nextitnet", user_vocab="u", item_vocab="i",
        cate_vocab="c", max_seq_length=L, batch_size=B, train_num_ngs=2,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        hidden_size=8, layer_sizes=(8,), activation=("relu",),
        dilations=(1, 2), kernel_size=3, seed=0)
    base.update(kw)
    return Config(**base).validate()


def test_expand_nextitnet_layout():
    rng_np = np.random.RandomState(0)
    batch = _batch(rng_np, 20, 5, 10)
    out = expand_nextitnet(jax.random.PRNGKey(0), batch, num_ngs=2)
    assert out.items.shape == (B, 3, L)
    assert out.labels.shape == (B, 3, L)
    np.testing.assert_array_equal(np.asarray(out.labels[:, 0, :]), 1.0)
    np.testing.assert_array_equal(np.asarray(out.labels[:, 1:, :]), 0.0)

    # positive targets: right-aligned history shifted left, line target last
    hist_r = np.asarray(right_align(
        jnp.asarray(batch.item_hist)[..., None],
        jnp.asarray(batch.mask))[..., 0])
    pos = np.asarray(out.items[:, 0, :])
    np.testing.assert_array_equal(pos[:, :-1], hist_r[:, 1:])
    np.testing.assert_array_equal(pos[:, -1], batch.items[:, 0])

    # negatives rarely equal their position's positive
    neg = np.asarray(out.items[:, 1:, :])
    own = neg == pos[:, None, :]
    assert own.mean() < 0.05


def test_per_position_training_runs_and_learns():
    rng_np = np.random.RandomState(0)
    n_items, n_cates, n_users = 25, 6, 10
    batches = [_batch(rng_np, n_items, n_cates, n_users) for _ in range(6)]
    cfg = _cfg()
    model = get_model_class("nextitnet")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    state = create_train_state(model, cfg, batches[0])
    step = make_train_step(model, cfg, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(4):
        for i, b in enumerate(batches):
            rng, sub = jax.random.split(rng)
            state, parts = step(state, b, sub)
            losses.append(float(parts.data_loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-6:]) < np.mean(losses[:6])


def test_eval_path_unchanged():
    # eval uses [B, G] targets and the last-position output
    rng_np = np.random.RandomState(1)
    cfg = _cfg()
    model = get_model_class("nextitnet")(
        cfg=cfg, n_users=10, n_items=25, n_cates=6)
    batch = _batch(rng_np, 25, 6, 10)
    state = create_train_state(model, cfg, batch)
    logits, aux = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False)
    assert logits.shape == (B, 1)
