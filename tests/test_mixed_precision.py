"""bf16 compute-dtype option: close to f32, trains, params stay f32."""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from tests.test_lazy_adam import _batch, L, B


def _cfg(dtype):
    return Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), seed=0,
        compute_dtype=dtype,
    ).validate()


@pytest.mark.slow
def test_bf16_forward_close_to_f32():
    batch = _batch(np.random.RandomState(0), 30, 6, 20)
    outs = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _cfg(dtype)
        model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=30,
                                        n_cates=6)
        state = create_train_state(model, cfg, batch)
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
        outs[dtype] = np.asarray(logits)
        # params stay float32 in both modes
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == np.float32
        assert logits.dtype == np.float32  # logits cast back
    diff = np.abs(outs["float32"] - outs["bfloat16"]).max()
    assert diff < 0.05, diff


def test_bf16_trains():
    batch = _batch(np.random.RandomState(1), 30, 6, 20)
    cfg = _cfg("bfloat16")
    model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=30,
                                    n_cates=6)
    state = create_train_state(model, cfg, batch)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        state, parts = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(parts.data_loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------- phase 2


def test_bf16_recurrences_close_to_f32():
    """With compute_dtype=bfloat16 the recurrence matmuls run in bf16
    (f32 carries/gates, ops/rnn.py) — outputs must track f32 closely."""
    import jax.numpy as jnp

    from clsr_tpu.ops.rnn import GRU, Time4LSTM

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 7, 10).astype(np.float32))
    mask = jnp.asarray((np.arange(7)[None] < rng.randint(1, 8, 4)[:, None])
                       .astype(np.float32))
    tl = jnp.asarray(rng.rand(4, 7).astype(np.float32))
    tn = jnp.asarray(rng.rand(4, 7).astype(np.float32))

    for make, args in [
        (lambda dt: GRU(8, dtype=dt), (x, mask)),
        (lambda dt: Time4LSTM(8, dtype=dt), (x, tl, tn, mask)),
    ]:
        m32 = make(None)
        params = m32.init(jax.random.PRNGKey(0), *args)["params"]
        out32, _ = m32.apply({"params": params}, *args)
        out16, _ = make(jnp.bfloat16).apply({"params": params}, *args)
        assert out16.dtype == np.float32  # carries/gates stay f32
        np.testing.assert_allclose(np.asarray(out32), np.asarray(out16),
                                   atol=0.03)


@pytest.mark.slow
def test_bf16_embedding_storage_trains():
    """bf16 tables + lazyadam: params stored bf16, moments f32, training
    moves touched rows and loss decreases."""
    batch = _batch(np.random.RandomState(2), 30, 6, 20)
    cfg = _cfg("bfloat16").replace(embedding_dtype="bfloat16",
                                   optimizer="lazyadam")
    model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=30,
                                    n_cates=6)
    state = create_train_state(model, cfg, batch)
    for name in ("item_embedding", "cate_embedding",
                 "user_long_embedding", "user_short_embedding"):
        assert state.params[name].dtype == np.dtype("bfloat16"), name
        assert state.opt_state.moments[(name,)].dtype == np.float32
    before = np.asarray(state.params["item_embedding"], np.float32).copy()
    step = make_train_step(model, cfg, donate=False)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        state, parts = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(parts.data_loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    after = np.asarray(state.params["item_embedding"], np.float32)
    assert state.params["item_embedding"].dtype == np.dtype("bfloat16")
    assert not np.allclose(before, after)


def test_bf16_embedding_requires_lazyadam():
    import pytest
    with pytest.raises(ValueError, match="lazyadam"):
        _cfg("float32").replace(embedding_dtype="bfloat16",
                                optimizer="adam").validate()
