"""Mesh-compact row engine (training/mesh_compact.py, ROADMAP r2 item 8).

Guarantees:
  * on a mesh, lazyadam states take the pmn fused layout and the train
    step routes through the mesh-compact path;
  * one step of mesh-compact training matches the single-device compact
    engine to Adam sign-flip noise, and the loss/reg/discrepancy
    trajectories track over further steps — for both a plain model
    (gru4rec) and CLSR (whose L2/discrepancy stats require the
    GLOBALLY-unique row semantics the gfirst mask provides);
  * tables whose row count doesn't divide the model axis fall back to
    the replicated-table update and still match;
  * the compiled step contains no full-table-shaped tensor and no
    table-sized all-gather (the collectives are per-shard id/grad
    exchanges + psums of gathered rows).
"""

import re

import flax.traverse_util as tu
import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                    place_state, shard_batch)
from clsr_tpu.training.lazy_adam import is_pmn
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch

N_ITEMS, N_CATES, N_USERS = 96, 24, 48


def _cfg(model="gru4rec", dp=1, mp=1, **kw):
    base = dict(
        model_type=model, user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=6, batch_size=16, train_num_ngs=2, hidden_size=8,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        layer_sizes=(8,), activation=("relu",), optimizer="lazyadam",
        enable_bn=False, seed=0, data_parallel=dp, model_parallel=mp,
        embed_l2=1e-4, is_clip_norm=1, max_grad_norm=0.5,
    )
    if model == "clsr":
        base.update(att_fcn_layer_sizes=(8,), hidden_size=12,
                    contrastive_loss="triplet", contrastive_loss_weight=0.1,
                    discrepancy_loss_weight=0.01,
                    contrastive_length_threshold=1)
    base.update(kw)
    return Config(**base).validate()


def _build(model_name, cfg, batch, n_items=N_ITEMS):
    model = get_model_class(model_name)(
        cfg=cfg, n_users=N_USERS, n_items=n_items, n_cates=N_CATES)
    return model, create_train_state(model, cfg, batch)


def _one_step_close(ref_params, got_params, lr, max_flips=5):
    """One-step equality up to Adam's +-lr sign flips on ~zero-gradient
    dims (see tests/test_lazy_adam_sharded.py for the rationale)."""
    a = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    b = jax.tree_util.tree_flatten_with_path(got_params)[0]
    d = np.concatenate([np.abs(np.asarray(x) - np.asarray(y)).ravel()
                        for (_, x), (_, y) in zip(a, b)])
    assert (d > 1e-6).sum() <= max_flips, (d > 1e-6).sum()
    assert d.max() <= 2.1 * lr, d.max()


@pytest.mark.parametrize("model_name,dp,mp,flat", [
    ("gru4rec", 4, 2, False),
    pytest.param("clsr", 2, 4, False, marks=pytest.mark.slow),
    ("gru4rec", 4, 2, True),
    pytest.param("clsr", 2, 4, True, marks=pytest.mark.slow),
])
def test_mesh_compact_matches_single_device(model_name, dp, mp, flat):
    """flat=True: the batch is sharded over BOTH mesh axes (flat data
    parallelism + DLRM-style table exchange, parallel/embedding.py) —
    must still equal the single-device engine."""
    rng_np = np.random.RandomState(0)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(4)]

    cfg1 = _cfg(model_name)
    model, state = _build(model_name, cfg1, batches[0])
    step1 = make_train_step(model, cfg1, donate=False)

    cfg2 = _cfg(model_name, dp=dp, mp=mp)
    model2, state2 = _build(model_name, cfg2, batches[0])
    # mesh lazyadam states must take the pmn fused layout now
    pflat = tu.flatten_dict(state2.params)
    assert all(is_pmn(pflat[p], mn)
               for p, mn in state2.opt_state.moments.items())
    mesh = make_mesh(dp, mp)
    sstate = place_state(state2, mesh, True)
    step2 = make_sharded_train_step(model2, cfg2, mesh, state2, True, flat)

    ref, got = [], []
    for i, b in enumerate(batches):
        state, rp = step1(state, b, jax.random.PRNGKey(i))
        sstate, gp = step2(sstate, shard_batch(b, mesh, flat),
                           jax.random.PRNGKey(i))
        ref.append([float(rp.loss), float(rp.regular_loss),
                    float(rp.discrepancy_loss)])
        got.append([float(gp.loss), float(gp.regular_loss),
                    float(gp.discrepancy_loss)])
        if i == 0:
            _one_step_close(state.params, sstate.params, cfg1.learning_rate)
    # trajectories track: loss + the globally-unique-row statistics
    # (regular includes the gfirst-masked lazy L2; discrepancy the
    # gfirst-masked user-table stats)
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_mesh_compact_replicated_table_fallback():
    """Item vocab 95 doesn't divide model=2: the item table (and its pmn
    array) stay replicated; the update must still match single-device."""
    n_items = 95
    rng_np = np.random.RandomState(1)
    batches = [_batch(rng_np, n_items, N_CATES, N_USERS) for _ in range(2)]

    cfg1 = _cfg()
    model, state = _build("gru4rec", cfg1, batches[0], n_items=n_items)
    step1 = make_train_step(model, cfg1, donate=False)

    cfg2 = _cfg(dp=4, mp=2)
    model2, state2 = _build("gru4rec", cfg2, batches[0], n_items=n_items)
    mesh = make_mesh(4, 2)
    sstate = place_state(state2, mesh, True)
    step2 = make_sharded_train_step(model2, cfg2, mesh, state2, True)

    for i, b in enumerate(batches):
        state, rp = step1(state, b, jax.random.PRNGKey(i))
        sstate, gp = step2(sstate, shard_batch(b, mesh),
                           jax.random.PRNGKey(i))
        if i == 0:
            _one_step_close(state.params, sstate.params, cfg1.learning_rate)
        np.testing.assert_allclose(float(rp.loss), float(gp.loss),
                                   rtol=1e-5)


@pytest.mark.parametrize("flat", [False, True])
def test_mesh_compact_hlo_has_no_full_table(flat):
    """The full item table is f32[192,8] (pmn f32[192,24]); per-shard
    halves are [96,*].  No full-table tensor and no table-sized
    all-gather may appear — the only f32 collectives are per-shard
    gathered-row psums/reduce-scatters and the w-gradient exchange.
    (n_items=192 keeps the vocab LARGER than the d*Mi=144 merge stream,
    so the update's min(M, N)-capped compact arrays cannot collide with
    the full-table shape.)  In flat mode the dense compute must be
    sharded over ALL 8 devices: per-device activations are [2, 8]
    (B=16/8), never [4, 8]."""
    rng_np = np.random.RandomState(0)
    n_items = 192
    batch = _batch(rng_np, n_items, N_CATES, N_USERS)
    cfg = _cfg(dp=4, mp=2)
    model, state = _build("gru4rec", cfg, batch, n_items=n_items)
    mesh = make_mesh(4, 2)
    sstate = place_state(state, mesh, True)
    step = make_sharded_train_step(model, cfg, mesh, state, True, flat)
    txt = step.lower(sstate, shard_batch(batch, mesh, flat),
                     jax.random.PRNGKey(0)).compile().as_text()
    assert not re.findall(r"f32\[192,8\]", txt)
    assert not re.findall(r"f32\[192,24\]", txt)
    assert not re.findall(r"all-gather[^\n]*f32\[192,", txt)
    if flat:
        assert not re.findall(r"f32\[4,8\]", txt)   # no 'data'-only dense
        assert re.findall(r"f32\[2,8\]", txt)       # d*m-way dense blocks


def test_mesh_compact_multi_step_matches_sequential():
    """K sharded steps per dispatch (mesh-compact inside lax.scan) must
    equal K sequential sharded single steps — the shard_map plan build /
    gather / update all trace inside the scan body."""
    from clsr_tpu.parallel.mesh import (make_sharded_multi_train_step,
                                        shard_stacked_batches)

    rng_np = np.random.RandomState(2)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(3)]

    cfg = _cfg(dp=4, mp=2)
    model, state = _build("gru4rec", cfg, batches[0])
    mesh = make_mesh(4, 2)

    s_seq = place_state(state, mesh, True)
    step = make_sharded_train_step(model, cfg, mesh, state, True)
    rng = jax.random.PRNGKey(7)
    for i in range(3):
        s_seq, parts_seq = step(s_seq, shard_batch(batches[i], mesh),
                                jax.random.fold_in(rng, i))

    s_multi = place_state(state, mesh, True)
    multi = make_sharded_multi_train_step(model, cfg, mesh, state, 3, True)
    stacked = shard_stacked_batches(batches, mesh)
    s_multi, parts_multi = multi(s_multi, stacked, rng)

    np.testing.assert_allclose(float(parts_multi.loss[-1]),
                               float(parts_seq.loss), rtol=1e-5)
    a = jax.tree_util.tree_flatten_with_path(s_seq.params)[0]
    b = jax.tree_util.tree_flatten_with_path(s_multi.params)[0]
    for (pa, x), (pb, y) in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=str(pa))
