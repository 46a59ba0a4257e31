"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                    place_state, shard_batch)
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step

L = 8
B = 16


def _tiny_batch(rng, n_items=40, n_cates=6, G=1):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, 20, B).astype(np.int32),
        items=rng.randint(1, n_items, (B, G)).astype(np.int32),
        cates=rng.randint(1, n_cates, (B, G)).astype(np.int32),
        labels=np.zeros((B, G), np.float32),
        item_hist=(rng.randint(1, n_items, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(1, n_cates, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=rng.rand(B, L).astype(np.float32) * mask,
        time_from_first=rng.rand(B, L).astype(np.float32) * mask,
        time_to_now=rng.rand(B, L).astype(np.float32) * mask,
        valid=np.ones(B, np.float32),
    )


def _cfg():
    return Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=3, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), seed=0,
    ).validate()


@pytest.fixture(scope="module")
def built(rng_mod=np.random.RandomState(0)):
    cfg = _cfg()
    model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=40, n_cates=6)
    batch = _tiny_batch(np.random.RandomState(0))
    state = create_train_state(model, cfg, batch)
    return cfg, model, batch, state


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_data,n_model,shard_emb", [
    (8, 1, False),   # pure DP
    (4, 2, True),    # DP x row-sharded embeddings
    pytest.param(2, 4, True, marks=pytest.mark.slow),
])
def test_sharded_step_runs(built, n_data, n_model, shard_emb):
    cfg, model, batch, state = built
    mesh = make_mesh(n_data, n_model)
    sstate = place_state(state, mesh, shard_embeddings=shard_emb)
    step = make_sharded_train_step(model, cfg, mesh, state,
                                   shard_embeddings=shard_emb)
    sbatch = shard_batch(batch, mesh)
    new_state, parts = step(sstate, sbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(parts.loss))
    # params actually changed
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dp_matches_single_device(built):
    """8-way data parallelism computes the same step as one device.

    Uses SGD: with Adam the first-step update is ~lr*sign(grad), which
    amplifies reduction-order noise into visible param differences."""
    cfg, model, batch, state = built
    cfg = cfg.replace(optimizer="sgd")
    from clsr_tpu.training.state import create_train_state as _cts
    state = _cts(model, cfg, batch)
    rng = jax.random.PRNGKey(7)

    single = make_train_step(model, cfg, donate=False)
    s1, parts1 = single(state, batch, rng)

    mesh = make_mesh(8, 1)
    sstate = place_state(state, mesh)
    step = make_sharded_train_step(model, cfg, mesh, state)
    s8, parts8 = step(sstate, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(parts1.loss), float(parts8.loss),
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
