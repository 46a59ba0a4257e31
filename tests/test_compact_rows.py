"""Compact row engine (training/compact_rows.py) vs the legacy path.

The engine restructures WHERE the table math happens (compact w-space
instead of dense [N, D] space) but not WHAT is computed; one train step
must match the legacy formulation to float noise, and the plan
bookkeeping must be exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step

L, B = 8, 16


def _batch(rng, n_items, n_cates, n_users, G=1):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, n_users, B).astype(np.int32),
        items=rng.randint(0, n_items, (B, G)).astype(np.int32),
        cates=rng.randint(0, n_cates, (B, G)).astype(np.int32),
        labels=np.ones((B, G), np.float32),
        item_hist=(rng.randint(0, n_items, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(0, n_cates, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32),
    )


def _cfg(model="clsr", **kw):
    base = dict(
        model_type=model, user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(8,), activation=("relu",), optimizer="lazyadam",
        seed=0, embed_l2=1e-4, layer_l2=1e-4)
    if model == "clsr":
        base.update(att_fcn_layer_sizes=(8,), contrastive_loss="triplet",
                    contrastive_loss_weight=0.1,
                    discrepancy_loss_weight=0.01, triplet_margin=1.0,
                    contrastive_length_threshold=1,
                    contrastive_recent_k=3)
    base.update(kw)
    return Config(**base).validate()


def test_plan_bookkeeping_exact():
    from clsr_tpu.training.compact_rows import build_plan

    rng = np.random.RandomState(0)
    hist = rng.randint(0, 12, (4, 5)).astype(np.int32)
    tgts = rng.randint(0, 12, (4, 2)).astype(np.int32)
    plan = build_plan({"hist": jnp.asarray(hist), "targets": jnp.asarray(tgts)})
    flat = np.concatenate([hist.reshape(-1), tgts.reshape(-1)])
    s = np.asarray(plan.sorted_ids)
    assert np.array_equal(s, np.sort(flat))
    # positions: sorted_ids[pos[site]] reproduces the original ids
    assert np.array_equal(s[np.asarray(plan.pos["hist"])], hist)
    assert np.array_equal(s[np.asarray(plan.pos["targets"])], tgts)
    # first / seg structure
    first = np.asarray(plan.first)
    assert first[0]
    assert np.array_equal(first[1:], s[1:] != s[:-1])
    seg = np.asarray(plan.seg)
    assert np.array_equal(seg, np.cumsum(first) - 1)
    idx_first = np.asarray(plan.idx_first)
    for r in range(seg[-1] + 1):
        assert idx_first[r] == np.flatnonzero(seg == r)[0]


def test_permuted_rows_values_and_gather_backward():
    """permuted_rows == per-site gathers, and its VJP is g[perm] (a
    gather, not a scatter-add) — bit-exact because `inv` is a
    permutation so no cotangent rows collide."""
    from clsr_tpu.training.compact_rows import (CompactRows, build_plan,
                                                permuted_rows)

    rng = np.random.RandomState(1)
    hist = rng.randint(0, 9, (3, 4)).astype(np.int32)
    tgts = rng.randint(0, 9, (3, 2)).astype(np.int32)
    plan = build_plan({"hist": jnp.asarray(hist), "targets": jnp.asarray(tgts)})
    M = plan.sorted_ids.shape[0]
    w = jnp.asarray(rng.randn(M, 5).astype(np.float32))

    rows = permuted_rows(w, plan.inv, plan.perm)
    cr = CompactRows(w=w, plan=plan, rows=rows)
    legacy = CompactRows(w=w, plan=plan)       # rows=None -> w[pos] path
    for s in ("hist", "targets"):
        assert np.array_equal(np.asarray(cr.site(s)),
                              np.asarray(legacy.site(s)))

    # gradients through sites match the scatter-add formulation exactly
    def loss_sites(wx, use_rows):
        c = CompactRows(
            w=wx, plan=plan,
            rows=permuted_rows(wx, plan.inv, plan.perm) if use_rows
            else None)
        return (jnp.sum(jnp.sin(c.site("hist")) * 0.7)
                + jnp.sum(c.site("targets") ** 2))

    g_new = jax.grad(lambda wx: loss_sites(wx, True))(w)
    g_old = jax.grad(lambda wx: loss_sites(wx, False))(w)
    assert np.array_equal(np.asarray(g_new), np.asarray(g_old))

    # the custom VJP really is the inverse permutation gather
    _, vjp = jax.vjp(lambda wx: permuted_rows(wx, plan.inv, plan.perm), w)
    g = jnp.asarray(rng.randn(M, 5).astype(np.float32))
    assert np.array_equal(np.asarray(vjp(g)[0]),
                          np.asarray(g[np.asarray(plan.perm)]))


@pytest.mark.parametrize("model", [
    pytest.param("clsr", marks=pytest.mark.slow), "gru4rec"])
def test_compact_matches_legacy_one_step(model):
    n_items, n_cates, n_users = 60, 15, 25
    rng_np = np.random.RandomState(1)
    batch = _batch(rng_np, n_items, n_cates, n_users)

    results = {}
    for mode in ("auto", "off"):
        cfg = _cfg(model, compact_rows=mode)
        m = get_model_class(model)(
            cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
        state = create_train_state(m, cfg, batch)
        step = make_train_step(m, cfg, donate=False)
        state, parts = step(state, batch, jax.random.PRNGKey(3))
        results[mode] = (state, parts)

    pa, pb = results["auto"][1], results["off"][1]
    np.testing.assert_allclose(float(pa.loss), float(pb.loss), rtol=1e-5)
    np.testing.assert_allclose(float(pa.regular_loss),
                               float(pb.regular_loss), rtol=1e-5)
    import flax.traverse_util as tu
    flat_a = tu.flatten_dict(results["auto"][0].params)
    flat_b = tu.flatten_dict(results["off"][0].params)
    for path, leaf in flat_a.items():
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=2e-6,
            err_msg=str(path))
    # optimizer moments match too: auto runs the pmn [N, 3D] param|mu|nu
    # layout, off the split [N, 2D] mu|nu layout — compare mu/nu lanes
    # (and the pmn param lane against the updated params)
    mn_a = results["auto"][0].opt_state.moments
    mn_b = results["off"][0].opt_state.moments
    for k in mn_a:
        a, b = np.asarray(mn_a[k]), np.asarray(mn_b[k])
        D = b.shape[1] // 2
        assert a.shape[1] == 3 * D, (k, a.shape)   # fused layout active
        np.testing.assert_allclose(a[:, D:], b, atol=2e-6, err_msg=str(k))
        np.testing.assert_allclose(
            a[:, :D], np.asarray(flat_a[k], np.float32), atol=2e-6,
            err_msg=str(k))


@pytest.mark.slow
def test_compact_loss_trajectory_tracks_legacy():
    n_items, n_cates, n_users = 60, 15, 25
    rng_np = np.random.RandomState(2)
    batches = [_batch(rng_np, n_items, n_cates, n_users) for _ in range(4)]

    traces = {}
    for mode in ("auto", "off"):
        cfg = _cfg("clsr", compact_rows=mode)
        m = get_model_class("clsr")(
            cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
        state = create_train_state(m, cfg, batches[0])
        step = make_train_step(m, cfg, donate=False)
        losses = []
        for i, b in enumerate(batches):
            state, parts = step(state, b, jax.random.PRNGKey(10 + i))
            losses.append(float(parts.loss))
        traces[mode] = losses
    np.testing.assert_allclose(traces["auto"], traces["off"], rtol=1e-3)


@pytest.mark.slow
def test_compact_bf16_tables_close():
    n_items, n_cates, n_users = 60, 15, 25
    rng_np = np.random.RandomState(3)
    batch = _batch(rng_np, n_items, n_cates, n_users)
    results = {}
    for mode in ("auto", "off"):
        cfg = _cfg("clsr", compact_rows=mode, embedding_dtype="bfloat16")
        m = get_model_class("clsr")(
            cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
        state = create_train_state(m, cfg, batch)
        step = make_train_step(m, cfg, donate=False)
        state, parts = step(state, batch, jax.random.PRNGKey(5))
        assert state.params["item_embedding"].dtype == jnp.bfloat16
        results[mode] = (float(parts.loss),
                         np.asarray(state.params["item_embedding"],
                                    dtype=np.float32))
    # bf16 grads accumulate in different orders across formulations;
    # bounded, not exact
    np.testing.assert_allclose(results["auto"][0], results["off"][0],
                               rtol=2e-2)
    np.testing.assert_allclose(results["auto"][1], results["off"][1],
                               atol=1e-2)


def test_compact_falls_back_for_ncf_and_mesh():
    """NCF's gmf/mlp tables have no site spec -> legacy path (still runs).
    """
    n_items, n_cates, n_users = 30, 10, 20
    rng_np = np.random.RandomState(4)
    batch = _batch(rng_np, n_items, n_cates, n_users)
    cfg = _cfg("ncf", compact_rows="auto", train_num_ngs=2)
    m = get_model_class("ncf")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    state = create_train_state(m, cfg, batch)
    step = make_train_step(m, cfg, donate=False)
    state, parts = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(parts.loss))


def test_compact_untouched_rows_unchanged():
    n_items, n_cates, n_users = 100, 20, 50
    rng_np = np.random.RandomState(5)
    batch = _batch(rng_np, 10, 5, n_users)
    cfg = _cfg("clsr", compact_rows="auto")
    m = get_model_class("clsr")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    state = create_train_state(m, cfg, batch)
    before = np.asarray(state.params["item_embedding"]).copy()
    step = make_train_step(m, cfg, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = np.asarray(state.params["item_embedding"])
    np.testing.assert_array_equal(before[10:], after[10:])
    assert not np.allclose(before[:10], after[:10])
