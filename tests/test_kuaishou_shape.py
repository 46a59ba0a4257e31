"""Kuaishou-shaped configuration: max_seq_length 250, 'ms' timestamps.

The forcing function for long-sequence handling (SURVEY.md section 6):
large L exercises the scan path, the grouped attention over 250 keys, and
ms time features."""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.parser import time_range_for_unit
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_train_step
from clsr_tpu.data.batch import Batch

L, B = 250, 8


def _batch(rng, n_items, n_cates, n_users):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, n_users, B).astype(np.int32),
        items=rng.randint(0, n_items, (B, 1)).astype(np.int32),
        cates=rng.randint(0, n_cates, (B, 1)).astype(np.int32),
        labels=np.ones((B, 1), np.float32),
        item_hist=(rng.randint(0, n_items, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(0, n_cates, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32),
    )


def test_ms_time_range():
    assert time_range_for_unit("ms") == 86400000.0


@pytest.mark.slow
def test_clsr_kuaishou_shape_trains():
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=B, train_num_ngs=2, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), time_unit="ms",
        pairwise_metrics=("mean_mrr", "ndcg@1;2"), seed=0,
    ).validate()
    model = get_model_class("clsr")(cfg=cfg, n_users=30, n_items=60,
                                    n_cates=8)
    rng_np = np.random.RandomState(0)
    batch = _batch(rng_np, 60, 8, 30)
    state = create_train_state(model, cfg, batch)
    step = make_train_step(model, cfg, donate=False)
    state, parts = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(parts.loss))
