"""Fused Pallas eval attention scorer (ops/pallas_attention.py).

The kernel must match the XLA TargetAttention eval path (which itself
reimplements _attention_fcn, clsr.py:343-381) to float noise — interpret
mode on the CPU test backend, same code path Mosaic compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.pallas_attention import use_eval_attention


def _setup(B=4, G=100, L=13, Dk=40, Dq=40, enable_bn=True, seed=0,
           layer_sizes=(12, 6)):
    rng = np.random.RandomState(seed)
    keys = jnp.asarray(rng.randn(B, L, Dk).astype(np.float32))
    query = jnp.asarray(rng.randn(B, G, Dq).astype(np.float32))
    lengths = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    mod = TargetAttention(layer_sizes, ("relu", "relu"), enable_bn=enable_bn)
    variables = mod.init(jax.random.PRNGKey(1), query, keys, mask)
    if enable_bn:
        # run a train-mode step so the running stats are non-trivial
        _, mutated = mod.apply(variables, query, keys, mask, train=True,
                               mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
    return mod, variables, query, keys, mask


@pytest.mark.parametrize("enable_bn", [False, True])
def test_kernel_matches_xla_eval(enable_bn):
    mod, variables, query, keys, mask = _setup(enable_bn=enable_bn)
    want = mod.apply(variables, query, keys, mask)
    with use_eval_attention(True):
        got = mod.apply(variables, query, keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_at_block_multiples():
    # L and G exact multiples of the block sizes (no padding path)
    mod, variables, query, keys, mask = _setup(B=2, G=32, L=128, seed=3)
    want = mod.apply(variables, query, keys, mask)
    with use_eval_attention(True):
        got = mod.apply(variables, query, keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_compute_close_to_f32():
    rng = np.random.RandomState(7)
    B, G, L, D = 3, 16, 24, 40
    keys = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    query = jnp.asarray(rng.randn(B, G, D).astype(np.float32))
    mask = jnp.asarray((np.arange(L)[None]
                        < rng.randint(1, L + 1, B)[:, None]).astype(np.float32))
    mod = TargetAttention((12, 6), ("relu",), enable_bn=False,
                          dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), query, keys, mask)
    want = mod.apply(variables, query, keys, mask)
    with use_eval_attention(True):
        got = mod.apply(variables, query, keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.05)


def test_gates_stay_on_xla_path():
    # train mode, small G, return_weights: all keep the XLA path (and
    # therefore stay exactly reproducible under the enabled context)
    mod, variables, query, keys, mask = _setup(G=5, enable_bn=False)
    want, w_want = mod.apply(variables, query, keys, mask,
                             return_weights=True)
    with use_eval_attention(True):
        got, w_got = mod.apply(variables, query, keys, mask,
                               return_weights=True)
        got2 = mod.apply(variables, query, keys, mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(w_got), np.asarray(w_want))
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_clsr_eval_step_flag_differential(tmp_path):
    """Full-model check: CLSR eval preds with the kernel flag on equal the
    XLA eval preds (grouped G=10 batch through make_eval_step)."""
    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step, make_train_step

    paths = write_synthetic_dataset(str(tmp_path), n_users=20, n_items=40,
                                    n_cates=6, test_num_ngs=9)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=8, batch_size=16, train_num_ngs=3, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(16, 8), att_fcn_layer_sizes=(12, 6), attention_size=12,
        enable_bn=True, seed=0, show_step=0, save_model=False,
        use_pallas_eval_attention="on",
    ).validate()
    model = get_model_class("clsr")(cfg=cfg, n_users=len(uv),
                                    n_items=len(iv), n_cates=len(cv))
    train_loader = SequenceLoader(parse_file(paths["train"], uv, iv, cv),
                                  max_seq_length=8)
    test_loader = SequenceLoader(parse_file(paths["test"], uv, iv, cv),
                                 max_seq_length=8)
    np_rng = np.random.RandomState(0)
    batches = list(train_loader.train_batches(cfg.batch_size, np_rng))
    state = create_train_state(model, cfg, batches[0])
    train_step = make_train_step(model, cfg, donate=False)
    rng = jax.random.PRNGKey(0)
    for batch in batches[:3]:
        rng, sub = jax.random.split(rng)
        state, _ = train_step(state, batch, sub)

    eval_on = make_eval_step(model, cfg)
    eval_off = make_eval_step(
        model, cfg.replace(use_pallas_eval_attention="off"))
    eval_batches = list(test_loader.eval_batches(10, batch_groups=8))
    assert eval_batches
    for batch in eval_batches[:2]:
        p_on, a_on = eval_on(state, batch)
        p_off, a_off = eval_off(state, batch)
        np.testing.assert_allclose(np.asarray(p_on), np.asarray(p_off),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(a_on), np.asarray(a_off),
                                   rtol=2e-5, atol=2e-5)
