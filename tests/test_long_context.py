"""Blockwise long-context attention (ops/long_context.py).

Must equal TargetAttention(enable_bn=False) exactly (streaming softmax
is algebraically the same softmax), for any block size, under grad, and
when the sequence axis is sharded over a mesh axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.long_context import LongTargetAttention


def _map_params(nested):
    """TargetAttention param tree -> LongTargetAttention flat tree."""
    flat = {"attention_mat": nested["attention_mat"]}
    fcn = nested["att_fcn"]
    i = 0
    while f"w_nn_layer{i}" in fcn:
        flat[f"w_nn_layer{i}_kernel"] = fcn[f"w_nn_layer{i}"]["kernel"]
        flat[f"w_nn_layer{i}_bias"] = fcn[f"w_nn_layer{i}"]["bias"]
        i += 1
    flat["w_nn_output_kernel"] = fcn["w_nn_output"]["kernel"]
    flat["w_nn_output_bias"] = fcn["w_nn_output"]["bias"]
    return flat


def _setup(B=4, G=3, L=97, Dk=16, Dq=16, seed=0):
    rng = np.random.RandomState(seed)
    keys = jnp.asarray(rng.randn(B, L, Dk).astype(np.float32))
    query = jnp.asarray(rng.randn(B, G, Dq).astype(np.float32))
    mask = jnp.asarray((np.arange(L)[None] <
                        rng.randint(1, L + 1, B)[:, None])
                       .astype(np.float32))
    ref = TargetAttention((12, 6), ("relu", "relu"), enable_bn=False)
    params = ref.init(jax.random.PRNGKey(1), query, keys, mask)["params"]
    return ref, params, query, keys, mask


@pytest.mark.parametrize("block", [16, 32, 97, 256])
def test_blockwise_equals_full(block):
    ref, params, query, keys, mask = _setup()
    want = ref.apply({"params": params}, query, keys, mask)
    mod = LongTargetAttention((12, 6), block_size=block)
    got = mod.apply({"params": _map_params(params)}, query, keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_blockwise_grad_matches():
    ref, params, query, keys, mask = _setup(L=64)
    mod = LongTargetAttention((12, 6), block_size=16)
    flat = _map_params(params)

    g_ref = jax.grad(lambda p: jnp.sum(
        ref.apply({"params": p}, query, keys, mask) ** 2))(params)
    g_new = jax.grad(lambda p: jnp.sum(
        mod.apply({"params": p}, query, keys, mask) ** 2))(flat)
    mapped = _map_params(g_ref)
    for k in mapped:
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(mapped[k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)


def test_ungrouped_query():
    ref, params, query, keys, mask = _setup()
    mod = LongTargetAttention((12, 6), block_size=32)
    got = mod.apply({"params": _map_params(params)}, query[:, 0], keys, mask)
    want = ref.apply({"params": params}, query[:, 0], keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_clsr_trains_with_blockwise_attention():
    """cfg.attention_block_size wires LongTargetAttention into CLSR."""
    from clsr_tpu.config import Config
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_train_step
    from tests.test_lazy_adam import _batch

    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=6, batch_size=16, train_num_ngs=2, hidden_size=12,
        item_embedding_dim=8, cate_embedding_dim=4, user_embedding_dim=12,
        layer_sizes=(8,), activation=("relu",), att_fcn_layer_sizes=(8, 4),
        enable_bn=False, attention_block_size=4, seed=0,
        learning_rate=0.01,
    ).validate()
    model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=30,
                                    n_cates=6)
    batch = _batch(np.random.RandomState(0), 30, 6, 20)
    state = create_train_state(model, cfg, batch)
    assert "long_term_att" in state.params
    assert "w_nn_layer0_kernel" in state.params["long_term_att"]
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(8):
        state, parts = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(parts.data_loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    with pytest.raises(ValueError, match="enable_bn"):
        Config(model_type="clsr", user_vocab="u", item_vocab="i",
               cate_vocab="c", user_embedding_dim=40,
               attention_block_size=256, enable_bn=True).validate()


def test_sequence_sharded_attention():
    """Keys sharded over a 'seq' mesh axis: per-shard streaming partials
    merged with lse algebra must equal the unsharded result."""
    ref, params, query, keys, mask = _setup(B=4, L=96)
    flat = _map_params(params)
    mod = LongTargetAttention((12, 6), block_size=16)
    want = mod.apply({"params": flat}, query, keys, mask)

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "seq"))

    def shard_fn(p, q, k, m):
        return mod.apply({"params": p}, q, k, m, axis_name="seq")

    got = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, "seq", None), P(None, "seq")),
        out_specs=P(),
        check_vma=False,
    ))(flat, query, keys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
