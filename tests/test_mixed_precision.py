"""bf16 compute-dtype option: close to f32, trains, params stay f32."""

import jax
import numpy as np

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
