"""Every zoo model: a few train steps reduce the loss; grouped eval runs."""

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.graph import build_interaction_graph
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.evaluator import run_weighted_eval
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_eval_step, make_train_step

L = 8
TEST_NGS = 9

MODELS = ["sli_rec", "caser", "a2svd", "din", "dien", "ncf", "nextitnet",
          "lgn"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = tmp_path_factory.mktemp("zoo")
    paths = write_synthetic_dataset(str(out), n_users=25, n_items=50,
                                    n_cates=8, test_num_ngs=TEST_NGS)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    loaders = {
        name: SequenceLoader(parse_file(paths[name], uv, iv, cv),
                             max_seq_length=L)
        for name in ("train", "test")
    }
    graph = build_interaction_graph(paths["train"], uv, iv, cv)
    return paths, (uv, iv, cv), loaders, graph


def _cfg(model_type):
    return Config(
        model_type=model_type, user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=24, train_num_ngs=3, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), attention_size=12,
        L=3, n_v=4, n_h=4, dilations=(1, 2), kernel_size=3,
        ncf_layer_sizes=(16, 8), seed=0, show_step=0, save_model=False,
    ).validate()


@pytest.mark.parametrize("model_type", MODELS)
def test_model_trains_and_evals(setup, model_type):
    paths, (uv, iv, cv), loaders, graph = setup
    cfg = _cfg(model_type)
    cls = get_model_class(model_type)
    kwargs = dict(cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
    if model_type == "lgn":
        kwargs["graph"] = graph
    model = cls(**kwargs)

    np_rng = np.random.RandomState(0)
    batches = list(loaders["train"].train_batches(cfg.batch_size, np_rng))
    state = create_train_state(model, cfg, batches[0])
    train_step = make_train_step(model, cfg, donate=False)

    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(4):
        for batch in batches:
            rng, sub = jax.random.split(rng)
            state, parts = train_step(state, batch, sub)
            losses.append(float(parts.data_loss))
    n = max(1, len(losses) // 4)
    assert np.mean(losses[-n:]) < np.mean(losses[:n]), (
        f"{model_type}: loss did not decrease "
        f"({np.mean(losses[:n]):.4f} -> {np.mean(losses[-n:]):.4f})")

    eval_step = make_eval_step(model, cfg)
    res = run_weighted_eval(eval_step, state, loaders["test"], cfg,
                            num_ngs=TEST_NGS)
    assert 0.0 <= res["auc"] <= 1.0
    assert "wauc" in res and "mean_mrr" in res
