"""Fused Pallas eval scorer under the mesh (VERDICT r2 item 4).

`use_pallas_eval_attention` must carry to sharded eval: the kernel runs
per batch shard inside a shard_map (ops/pallas_attention.py:
fused_eval_attention_mesh — pallas_call has no GSPMD rule, but the
scorer is per-row pure), with preds equal to the XLA mesh eval path.
Interpret mode on the CPU test backend, same code Mosaic compiles on
TPU.
"""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_eval_step,
                                    place_state, shard_batch)
from clsr_tpu.training.state import create_train_state

N_ITEMS, N_CATES, N_USERS = 96, 24, 48
B, L, G = 16, 6, 10


def _gbatch(rng, g=G):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, N_USERS, B).astype(np.int32),
        items=rng.randint(0, N_ITEMS, (B, g)).astype(np.int32),
        cates=rng.randint(0, N_CATES, (B, g)).astype(np.int32),
        labels=np.concatenate(
            [np.ones((B, 1)), np.zeros((B, g - 1))], 1).astype(np.float32),
        item_hist=(rng.randint(0, N_ITEMS, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(0, N_CATES, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32),
    )


def _cfg(pallas, enable_bn=False, dp=4, mp=2, **kw):
    base = dict(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=8,
        layer_sizes=(8,), activation=("relu",), optimizer="lazyadam",
        att_fcn_layer_sizes=(8, 6), contrastive_loss="triplet",
        contrastive_loss_weight=0.1, discrepancy_loss_weight=0.01,
        contrastive_length_threshold=1, enable_bn=enable_bn, seed=0,
        data_parallel=dp, model_parallel=mp,
        use_pallas_eval_attention=pallas,
    )
    base.update(kw)
    return Config(**base).validate()


def _eval(cfg, batch, flat, monkeypatch=None, spy=None):
    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg, batch)
    mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    # mirror the Trainer: tables sharded only when model_parallel > 1
    shard_emb = cfg.model_parallel > 1
    sstate = place_state(state, mesh, shard_emb)
    step = make_sharded_eval_step(model, cfg, mesh, state, shard_emb,
                                  flat)
    preds, alpha = step(sstate, shard_batch(batch, mesh, flat))
    return np.asarray(preds), np.asarray(alpha)


@pytest.mark.parametrize("flat,enable_bn,dp,mp", [
    (True, False, 4, 2), (False, False, 4, 2), (True, True, 4, 2),
    # data-parallel-only mesh: the table context is None inside the
    # trace, but the batch is sharded — the kernel must still route
    # through the shard_map wrapper, never a bare GSPMD pallas_call
    (False, False, 8, 1),
])
def test_mesh_eval_pallas_matches_xla(flat, enable_bn, dp, mp,
                                      monkeypatch):
    """Sharded eval with the kernel 'on' == the XLA mesh eval path, and
    the shard_map kernel wrapper is actually what ran (spied)."""
    import clsr_tpu.ops.pallas_attention as pa

    batch = _gbatch(np.random.RandomState(0))
    want, want_a = _eval(_cfg("off", enable_bn, dp=dp, mp=mp), batch,
                         flat)

    called = {}
    orig = pa.fused_eval_attention_mesh

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa, "fused_eval_attention_mesh", spy)
    got, got_a = _eval(_cfg("on", enable_bn, dp=dp, mp=mp), batch, flat)
    assert called.get("hit"), "mesh eval did not route through the kernel"
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_a, want_a, rtol=2e-5, atol=2e-5)


def test_mesh_eval_pallas_matches_single_device(monkeypatch):
    """Mesh kernel eval == single-device kernel eval (same params)."""
    from clsr_tpu.training.steps import make_eval_step

    batch = _gbatch(np.random.RandomState(1))
    cfg1 = _cfg("on", dp=1, mp=1)
    model = get_model_class("clsr")(
        cfg=cfg1, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg1, batch)
    # single device: force the kernel (interpret on CPU)
    from clsr_tpu.training.steps import make_eval_step_fn
    step1 = jax.jit(make_eval_step_fn(model, cfg1, allow_pallas=True))
    want, _ = step1(state, batch)

    got, _ = _eval(_cfg("on"), batch, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _train(cfg, batch, flat, key=3):
    from clsr_tpu.parallel.mesh import make_sharded_train_step

    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    state = create_train_state(model, cfg, batch,
                               rng=jax.random.PRNGKey(0))
    mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
    shard_emb = cfg.model_parallel > 1
    sstate = place_state(state, mesh, shard_emb)
    step = make_sharded_train_step(model, cfg, mesh, state, shard_emb,
                                   flat)
    nst, parts = step(sstate, shard_batch(batch, mesh, flat),
                      jax.random.PRNGKey(key))
    return nst, parts


@pytest.mark.parametrize("flat,enable_bn,dp,mp", [
    (True, True, 4, 2),
    # the non-flat 4x2 and data-parallel-only 8x1 variants (batch
    # sharded, tables not — the kernel must still go through the
    # shard_map island) are full-suite coverage (suite budget,
    # VERDICT r4 item 6)
    pytest.param(False, True, 4, 2, marks=pytest.mark.slow),
    pytest.param(False, True, 8, 1, marks=pytest.mark.slow),
])
def test_mesh_train_pallas_matches_xla(flat, enable_bn, dp, mp,
                                       monkeypatch):
    """Sharded TRAIN step with the fused train scorer 'on' == the XLA
    mesh train path: identical losses (float noise) and BN running
    stats — the proof that the shard_map island's psum'd batch-BN
    statistics are GLOBAL over [B, L, G], not per-shard (dp=4/8 means
    per-shard stats would diverge hard) — and the island is what ran
    (spied)."""
    import clsr_tpu.ops.pallas_attention as pa
    from tests.test_mesh_compact import _one_step_close

    rng = np.random.RandomState(5)
    tb = _gbatch(rng, g=1)   # g=1: positives only, labels all-ones

    want_st, want_parts = _train(
        _cfg("off", enable_bn, dp=dp, mp=mp,
             use_pallas_train_attention="off"), tb, flat)

    called = {}
    orig = pa.fused_train_attention_mesh

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa, "fused_train_attention_mesh", spy)
    got_st, got_parts = _train(
        _cfg("off", enable_bn, dp=dp, mp=mp,
             use_pallas_train_attention="on"), tb, flat)
    assert called.get("hit"), "mesh train did not route through the island"

    np.testing.assert_allclose(float(got_parts.loss),
                               float(want_parts.loss),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(float(got_parts.data_loss),
                               float(want_parts.data_loss),
                               rtol=5e-4, atol=1e-6)
    _one_step_close(jax.device_get(want_st.params),
                    jax.device_get(got_st.params), 0.001)
    if enable_bn:
        fa = jax.tree_util.tree_flatten_with_path(
            jax.device_get(want_st.batch_stats))[0]
        fb = jax.tree_util.tree_flatten_with_path(
            jax.device_get(got_st.batch_stats))[0]
        assert len(fa) == len(fb) and len(fa) > 0
        for (p_a, a), (p_b, b) in zip(fa, fb):
            assert str(p_a) == str(p_b)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=str(p_a))
