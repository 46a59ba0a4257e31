"""Owner-routed O(M/m) mesh update merge (lazy_adam.py
compact_table_update_mesh_owner; design: docs/SCALING.md "pod-scale
refinement", SURVEY §2.4 ragged_all_to_all row).

Guarantees:
  * mesh_update_routing='owner' is differential-equal to the broadcast
    merge (and hence the single-device compact engine) — CLSR 2x4 and
    GRU4Rec 4x2, flat and non-flat batch sharding, and under the
    default INTERLEAVED row layout (parallel/rowmap.py);
  * overflow is LOSSLESS by default (mesh_owner_overflow='fallback'):
    even a capacity forcing overflow on every step matches the
    broadcast merge exactly, with route_overflow as telemetry;
  * mesh_owner_overflow='drop' keeps a compiled program with NO
    full-stream (M-sized) gradient collective: all-to-alls + O(M/m)
    all-gathers only;
  * the interleaved layout spreads zipf/frequency-ordered ids
    near-uniformly over owners (the contiguous layout's shard-0
    hotspot is gone);
  * checkpoints round-trip between the interleaved mesh layout and a
    single device (save de-interleaves to the logical layout);
  * tables that don't divide the model axis fall back to the broadcast
    merge and still match single-device.
"""

import re

import jax
import numpy as np
import pytest

from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                    place_state, shard_batch)
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch
from tests.test_mesh_compact import (N_CATES, N_ITEMS, N_USERS, _build,
                                     _cfg, _one_step_close)


def _run_mesh(model_name, cfg, batches, rngs, flat):
    mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    model, state = _build(model_name, cfg, batches[0])
    sstate = place_state(state, mesh, True, cfg)
    step = make_sharded_train_step(model, cfg, mesh, state, True, flat)
    traj = []
    for b, r in zip(batches, rngs):
        sstate, parts = step(sstate, shard_batch(b, mesh, flat), r)
        traj.append([float(parts.loss), float(parts.regular_loss),
                     float(parts.discrepancy_loss)])
    return sstate, traj


def _logical_params(sstate, cfg, mesh):
    """Undo the interleaved physical layout for direct param
    comparisons (parallel/rowmap.py)."""
    from clsr_tpu.parallel.rowmap import (permute_state_rows,
                                          resolve_interleaved)
    host = jax.device_get(sstate)
    if resolve_interleaved(cfg):
        host = permute_state_rows(host, mesh, True, to_physical=False)
    return host.params


@pytest.mark.parametrize("model_name,dp,mp,flat", [
    ("gru4rec", 4, 2, True),
    ("gru4rec", 4, 2, False),
    pytest.param("clsr", 2, 4, True, marks=pytest.mark.slow),
    pytest.param("clsr", 2, 4, False, marks=pytest.mark.slow),
])
def test_owner_matches_broadcast(model_name, dp, mp, flat):
    """Owner routing == broadcast merge == single-device engine (up to
    float reassociation; one-step up to Adam sign flips)."""
    rng_np = np.random.RandomState(0)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(3)]
    rngs = [jax.random.PRNGKey(i) for i in range(3)]

    kw = dict(dp=dp, mp=mp,
              mesh_flat_batch="on" if flat else "off")
    cfg_b = _cfg(model_name, **kw)
    cfg_o = _cfg(model_name, mesh_update_routing="owner",
                 mesh_owner_capacity=8.0, **kw)

    s_b, traj_b = _run_mesh(model_name, cfg_b, batches, rngs, flat)
    s_o, traj_o = _run_mesh(model_name, cfg_o, batches, rngs, flat)

    # ample capacity: nothing may have overflowed
    assert int(np.asarray(s_o.opt_state.route_overflow)) == 0
    mesh = make_mesh(cfg_o.data_parallel, cfg_o.model_parallel)
    _one_step_close(s_b.params, _logical_params(s_o, cfg_o, mesh),
                    cfg_b.learning_rate)
    np.testing.assert_allclose(traj_b, traj_o, rtol=1e-4, atol=1e-7)

    # and against the single-device compact engine
    cfg1 = _cfg(model_name)
    model, state = _build(model_name, cfg1, batches[0])
    step1 = make_train_step(model, cfg1, donate=False)
    traj1 = []
    for b, r in zip(batches, rngs):
        state, parts = step1(state, b, r)
        traj1.append([float(parts.loss), float(parts.regular_loss),
                      float(parts.discrepancy_loss)])
    np.testing.assert_allclose(traj1, traj_o, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("flat", [
    True, pytest.param(False, marks=pytest.mark.slow)])
def test_owner_hlo_collective_sizes(flat):
    """O(M/m) wire check.  GRU4Rec 4x2, B=16: the item/cate tables see
    Mi sorted ids per shard; the broadcast merge all-gathers the full
    f32[n_shards*Mi, D] gradient stream (it shows up as an
    f32[n, Mi, 8] all-gather), the owner merge must not materialize any
    full-stream tensor — its collectives are [m, C(, D)] all-to-alls
    (flat mode) and [d(*m), C(, D)] all-gathers with C = Mi/m here
    (mesh_owner_capacity=1)."""
    rng_np = np.random.RandomState(0)
    batch = _batch(rng_np, N_ITEMS, N_CATES, N_USERS)
    kw = dict(dp=4, mp=2, mesh_flat_batch="on" if flat else "off")
    mesh = make_mesh(4, 2)

    def compiled_text(cfg):
        model, state = _build("gru4rec", cfg, batch)
        sstate = place_state(state, mesh, True, cfg)
        step = make_sharded_train_step(model, cfg, mesh, state, True, flat)
        return step.lower(sstate, shard_batch(batch, mesh, flat),
                          jax.random.PRNGKey(0)).compile().as_text()

    txt_b = compiled_text(_cfg("gru4rec", **kw))
    # 'drop' mode carries the static wire-byte guarantee (no broadcast
    # fallback branch anywhere in the program); the default 'fallback'
    # mode is checked below to contain the lax.cond conditional
    txt_o = compiled_text(_cfg("gru4rec", mesh_update_routing="owner",
                               mesh_owner_capacity=1.0,
                               mesh_owner_overflow="drop", **kw))

    # per-shard sorted-id count for the item table: each shard holds
    # b rows x (L hist + (1+ngs) targets) ids
    n_batch_shards = 8 if flat else 4
    b_loc = 16 // n_batch_shards
    mi = b_loc * (6 + 3)
    # broadcast ships the full stream: an f32[n, Mi, 8] all-gather
    # (HLO prints the result shape LEFT of the op name)
    full = rf"f32\[{n_batch_shards},{mi},8\][^\n]*all-gather"
    assert re.findall(full, txt_b), "broadcast baseline changed shape?"
    # owner: no full-stream tensor anywhere in the program
    assert not re.findall(rf"f32\[{n_batch_shards},{mi},8\]", txt_o)
    c = -(-mi // 2)   # capacity factor 1.0, m=2
    if flat:
        # XLA decomposes the [m, C, D] all_to_all into per-peer pieces
        assert re.findall(rf"f32\[1,{c},8\][^\n]*all-to-all", txt_o)
    # the merge collective is the O(M/m) bucket gather over 'data'
    assert re.findall(
        rf"f32\[4,2,{c},8\][^\n]*all-gather|f32\[4,{c},8\][^\n]*all-gather",
        txt_o)

    # default 'fallback' mode: the lossless overflow path exists as a
    # conditional — the full-stream all-gather may appear, but only
    # inside the cond branch, never unconditionally
    txt_f = compiled_text(_cfg("gru4rec", mesh_update_routing="owner",
                               mesh_owner_capacity=1.0, **kw))
    assert "conditional" in txt_f, "lossless fallback cond missing"


def test_owner_overflow_counted():
    """mesh_owner_overflow='drop' (round-3 semantics): entries are
    dropped, the drop count accumulates in route_overflow, training
    still produces finite losses/params."""
    rng_np = np.random.RandomState(1)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(2)]
    rngs = [jax.random.PRNGKey(i) for i in range(2)]
    cfg = _cfg("gru4rec", dp=4, mp=2, mesh_flat_batch="on",
               mesh_update_routing="owner", mesh_owner_capacity=0.01,
               mesh_owner_overflow="drop")
    sstate, traj = _run_mesh("gru4rec", cfg, batches, rngs, True)
    assert int(np.asarray(sstate.opt_state.route_overflow)) > 0
    assert np.isfinite(np.asarray(traj)).all()
    leaves = jax.tree_util.tree_leaves(sstate.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("model_name,dp,mp,flat", [
    ("gru4rec", 4, 2, True),
    pytest.param("clsr", 2, 4, False, marks=pytest.mark.slow),
])
def test_owner_overflow_lossless(model_name, dp, mp, flat):
    """VERDICT r3 item 3a: with the default mesh_owner_overflow=
    'fallback', a capacity forcing overflow on EVERY step (< 1 slot of
    headroom) must be EXACTLY equal to the broadcast merge — the
    lax.cond fallback replays the identical broadcast merge ops, so the
    trajectories match bitwise, and route_overflow still counts the
    would-be drops as telemetry."""
    rng_np = np.random.RandomState(3)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS) for _ in range(3)]
    rngs = [jax.random.PRNGKey(i) for i in range(3)]
    kw = dict(dp=dp, mp=mp, mesh_flat_batch="on" if flat else "off")

    cfg_b = _cfg(model_name, **kw)
    cfg_o = _cfg(model_name, mesh_update_routing="owner",
                 mesh_owner_capacity=0.01, **kw)
    assert cfg_o.mesh_owner_overflow == "fallback"   # the default

    s_b, traj_b = _run_mesh(model_name, cfg_b, batches, rngs, flat)
    s_o, traj_o = _run_mesh(model_name, cfg_o, batches, rngs, flat)

    assert int(np.asarray(s_o.opt_state.route_overflow)) > 0
    np.testing.assert_array_equal(np.asarray(traj_b), np.asarray(traj_o))
    mesh = make_mesh(dp, mp)
    lp = _logical_params(s_o, cfg_o, mesh)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(s_b.params)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(lp)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_interleaved_occupancy_uniform():
    """VERDICT r3 item 3b: zipf-distributed, frequency-ordered ids land
    near-uniformly across owners under the interleaved layout, while
    contiguous ownership piles them onto shard 0."""
    from clsr_tpu.parallel.rowmap import owner_local

    m, N = 8, 80_000
    rows = N // m
    rng = np.random.RandomState(0)
    # frequency-ordered zipf ids (the ETL's vocab order): id 0 hottest
    ids = np.minimum(rng.zipf(1.2, size=200_000) - 1, N - 1)
    uniq = np.unique(ids)
    own_c, _ = owner_local(uniq, m, rows, False)
    own_i, _ = owner_local(uniq, m, rows, True)
    cnt_c = np.bincount(own_c, minlength=m)
    cnt_i = np.bincount(own_i, minlength=m)
    # contiguous: structurally skewed (shard 0 holds the hot prefix)
    assert cnt_c[0] > 3 * cnt_c.mean()
    # interleaved: near-uniform (sampling noise only; the unique-id set
    # itself spreads within +-1 row per shard for any id prefix)
    assert cnt_i.max() <= 1.05 * cnt_i.mean()
    assert cnt_i.min() >= 0.95 * cnt_i.mean()


def test_interleaved_checkpoint_roundtrip(tmp_path):
    """Checkpoints store the LOGICAL row layout: a trainer running the
    interleaved mesh layout (owner routing) saves a checkpoint that a
    SINGLE-DEVICE trainer restores to identical logical params — and
    the mesh trainer restores its own checkpoint back to the identical
    mesh state (Trainer.save/load, parallel/rowmap.py)."""
    from clsr_tpu.training.trainer import Trainer
    from tests.test_mesh_compact import _cfg as mc_cfg

    rng_np = np.random.RandomState(5)
    batch = _batch(rng_np, N_ITEMS, N_CATES, N_USERS)
    cfg = mc_cfg("gru4rec", dp=4, mp=2, mesh_flat_batch="on",
                 mesh_update_routing="owner", mesh_owner_capacity=8.0,
                 model_dir=str(tmp_path / "m"), save_model=True,
                 train_steps_per_call=1)
    model, state = _build("gru4rec", cfg, batch)

    tr = Trainer(model, cfg, batch, log=lambda *a: None)
    mesh = tr._mesh
    tr.state, _ = tr.train_step(tr.state, shard_batch(batch, mesh, True),
                                jax.random.PRNGKey(0))
    lp_before = _logical_params(tr.state, cfg, mesh)
    tr.save(str(tmp_path / "ck"))

    # 1. single-device trainer restores the logical params
    cfg1 = mc_cfg("gru4rec")
    model1, _ = _build("gru4rec", cfg1, batch)
    tr1 = Trainer(model1, cfg1, batch, log=lambda *a: None)
    tr1.load(str(tmp_path / "ck"))
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(lp_before)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(
                jax.device_get(tr1.state).params)[0],
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # 2. the mesh trainer restores its own checkpoint bit-identically
    tr.load(str(tmp_path / "ck"))
    lp_after = _logical_params(tr.state, cfg, mesh)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(lp_before)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(lp_after)[0],
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


@pytest.mark.slow
def test_owner_overflow_trainer_warns(tmp_path):
    """The trainer surfaces bucket overflow once per epoch: a mesh fit
    with a far-too-small capacity must log the WARNING (and still
    finish the epoch with finite metrics)."""
    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.trainer import Trainer

    paths = write_synthetic_dataset(str(tmp_path), n_users=40, n_items=96,
                                    n_cates=12, valid_num_ngs=4,
                                    test_num_ngs=4, seed=1)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    cfg = Config(
        model_type="gru4rec", user_vocab="u", item_vocab="i",
        cate_vocab="c", item_embedding_dim=8, cate_embedding_dim=4,
        hidden_size=12, max_seq_length=8, batch_size=16, train_num_ngs=2,
        valid_num_ngs=4, epochs=1, early_stop=0, save_model=False,
        show_step=0, enable_bn=False, seed=3, train_steps_per_call=2,
        layer_sizes=(8,), activation=("relu",), optimizer="lazyadam",
        data_parallel=4, model_parallel=2,
        mesh_update_routing="owner", mesh_owner_capacity=0.01,
        mesh_owner_overflow="drop",   # 'fallback' logs a NOTE instead
    ).validate()
    # pad table sizes to a multiple of model_parallel so the tables
    # actually shard (odd vocab sizes would fall back to the broadcast
    # merge and never exercise the owner buckets)
    def pad2(n):
        return n + (-n) % 2

    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=pad2(len(uv)), n_items=pad2(len(iv)),
        n_cates=pad2(len(cv)))
    tl = SequenceLoader(parse_file(paths["train"], uv, iv, cv),
                        cfg.max_seq_length)
    vl = SequenceLoader(parse_file(paths["valid"], uv, iv, cv),
                        cfg.max_seq_length)
    logs = []
    tr = Trainer(model, cfg, next(tl.train_batches(
        cfg.batch_size, np.random.RandomState(0))),
        log=lambda *a: logs.append(" ".join(str(x) for x in a)))
    tr.fit(tl, vl)
    assert any("owner-routed update merge dropped" in l for l in logs), \
        logs[-5:]
    assert int(np.asarray(tr.state.opt_state.route_overflow)) > 0


def test_owner_replicated_table_fallback():
    """Item vocab 95 doesn't divide model=2: with routing='owner' the
    item table falls back to the broadcast merge; the step must still
    match single-device."""
    n_items = 95
    rng_np = np.random.RandomState(2)
    batches = [_batch(rng_np, n_items, N_CATES, N_USERS) for _ in range(2)]

    cfg1 = _cfg()
    model, state = _build("gru4rec", cfg1, batches[0], n_items=n_items)
    step1 = make_train_step(model, cfg1, donate=False)

    cfg2 = _cfg(dp=4, mp=2, mesh_update_routing="owner")
    model2, state2 = _build("gru4rec", cfg2, batches[0], n_items=n_items)
    mesh = make_mesh(4, 2)
    sstate = place_state(state2, mesh, True, cfg2)
    step2 = make_sharded_train_step(model2, cfg2, mesh, state2, True)

    for i, b in enumerate(batches):
        state, rp = step1(state, b, jax.random.PRNGKey(i))
        sstate, gp = step2(sstate, shard_batch(b, mesh),
                           jax.random.PRNGKey(i))
        if i == 0:
            _one_step_close(state.params,
                            _logical_params(sstate, cfg2, mesh),
                            cfg1.learning_rate)
        np.testing.assert_allclose(float(rp.loss), float(gp.loss),
                                   rtol=1e-5)
