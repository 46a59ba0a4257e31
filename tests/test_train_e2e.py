"""End-to-end smoke: synthetic data -> train CLSR / GRU4Rec -> eval.

Mirrors SURVEY.md section 7 stage 3: exercises every layer (parse, pad,
device-side negative sampling, forward, 4-part loss, Adam+clip update, BN
stats, grouped eval, weighted metrics, checkpoint save/restore)."""

import os

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.evaluator import run_weighted_eval
from clsr_tpu.training.negative_sampling import sample_in_batch_negatives
from clsr_tpu.training.trainer import Trainer

L = 10
TEST_NGS = 9


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("e2e")
    paths = write_synthetic_dataset(str(out), n_users=30, n_items=60,
                                    n_cates=8, valid_num_ngs=4,
                                    test_num_ngs=TEST_NGS)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    loaders = {
        name: SequenceLoader(parse_file(paths[name], uv, iv, cv),
                             max_seq_length=L)
        for name in ("train", "valid", "test")
    }
    return paths, (uv, iv, cv), loaders


def _config(model_type, uv, iv, cv, **kw):
    base = dict(
        model_type=model_type, user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=32, epochs=2, train_num_ngs=3,
        valid_num_ngs=4, test_num_ngs=TEST_NGS, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), show_step=0,
        save_model=False, seed=42, early_stop=10,
    )
    base.update(kw)
    return Config(**base).validate()


def _build(cfg, uv, iv, cv, loaders):
    model_cls = get_model_class(cfg.model_type)
    model = model_cls(cfg=cfg, n_users=len(uv), n_items=len(iv),
                      n_cates=len(cv))
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    return model, sample


def test_negative_sampler_distribution():
    rng = jax.random.PRNGKey(0)
    items = np.array([1, 2, 3, 4, 5, 1, 1, 1], dtype=np.int32)
    cates = np.array([1, 1, 2, 2, 3, 1, 1, 1], dtype=np.int32)
    valid = np.ones(8, dtype=np.float32)
    neg_i, neg_c = sample_in_batch_negatives(
        rng, jax.numpy.array(items), jax.numpy.array(cates),
        jax.numpy.array(valid), num_ngs=4)
    neg_i, neg_c = np.asarray(neg_i), np.asarray(neg_c)
    # negatives come from batch positives and (almost) never equal own item
    assert set(neg_i.reshape(-1)).issubset(set(items))
    own = items[:, None] == neg_i
    assert own.mean() < 0.05
    # cate follows the sampled item's cate
    item2cate = {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}
    for i, c in zip(neg_i.reshape(-1), neg_c.reshape(-1)):
        assert item2cate[int(i)] == int(c)


@pytest.mark.parametrize("model_type", ["gru4rec", "clsr"])
def test_train_improves_and_evals(setup, model_type):
    paths, (uv, iv, cv), loaders = setup
    cfg = _config(model_type, uv, iv, cv)
    model, sample = _build(cfg, uv, iv, cv, loaders)
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)

    first_losses, last_losses = [], []
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.RandomState(0)
    for epoch in range(3):
        losses = []
        for batch in loaders["train"].train_batches(cfg.batch_size, np_rng):
            rng, sub = jax.random.split(rng)
            trainer.state, parts = trainer.train_step(trainer.state, batch, sub)
            losses.append(float(parts.data_loss))
        if epoch == 0:
            first_losses = losses
        last_losses = losses
    assert np.mean(last_losses) < np.mean(first_losses)

    res = run_weighted_eval(trainer.eval_step, trainer.state,
                            loaders["test"], cfg, num_ngs=TEST_NGS)
    for key in ("auc", "logloss", "mean_mrr", "group_auc", "wauc"):
        assert key in res
    assert 0.0 <= res["auc"] <= 1.0
    # a model trained for 3 epochs on tiny data should beat random
    assert res["auc"] > 0.5


def test_clsr_loss_parts_present(setup):
    paths, (uv, iv, cv), loaders = setup
    cfg = _config("clsr", uv, iv, cv, contrastive_length_threshold=1)
    model, sample = _build(cfg, uv, iv, cv, loaders)
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    state, parts = trainer.train_step(trainer.state, sample,
                                      jax.random.PRNGKey(1))
    assert float(parts.contrastive_loss) != 0.0
    assert float(parts.discrepancy_loss) <= 0.0  # negative by construction
    assert float(parts.regular_loss) > 0.0


def test_checkpoint_roundtrip(setup, tmp_path):
    paths, (uv, iv, cv), loaders = setup
    cfg = _config("clsr", uv, iv, cv)
    model, sample = _build(cfg, uv, iv, cv, loaders)
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    state, _ = trainer.train_step(trainer.state, sample, jax.random.PRNGKey(2))
    trainer.state = state
    ckpt_path = str(tmp_path / "ckpt" / "epoch_1")
    trainer.save(ckpt_path)

    trainer2 = Trainer(model, cfg, sample, log=lambda *a: None)
    trainer2.load_latest(str(tmp_path / "ckpt"))
    p1 = jax.tree_util.tree_leaves(trainer.state.params)
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (true resume)
    o1 = jax.tree_util.tree_leaves(trainer.state.opt_state)
    o2 = jax.tree_util.tree_leaves(trainer2.state.opt_state)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
