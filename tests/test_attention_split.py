"""SplitFirstDense / TargetAttention decomposition (ops/mlp.py).

The split first layer must equal the explicit concat([k, q, k-q, k*q])
@ kernel formulation (clsr.py:355-368) bit-for-bit up to float
reassociation, for both the forward value and the gradients.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clsr_tpu.ops.attention import MASK_PADDING_VALUE, TargetAttention


def manual_attention(params, query, keys, mask, layer_sizes):
    """The round-1 concat-based scorer, replayed on the module's params."""
    W = params["attention_mat"]
    ai = jnp.einsum("bld,dq->blq", keys, W)
    if query.ndim == 2:
        query = query[:, None, :]
    B, G, Dq = query.shape
    L = keys.shape[1]
    ai_b = jnp.broadcast_to(ai[:, None], (B, G, L, Dq))
    q_b = jnp.broadcast_to(query[:, :, None], (B, G, L, Dq))
    x = jnp.concatenate([ai_b, q_b, ai_b - q_b, ai_b * q_b], -1)
    fcn = params["att_fcn"]
    for idx in range(len(layer_sizes)):
        lyr = fcn[f"w_nn_layer{idx}"]
        x = jax.nn.relu(x @ lyr["kernel"] + lyr["bias"])
    out = fcn["w_nn_output"]
    logits = (x @ out["kernel"] + out["bias"])[..., 0]
    masked = jnp.where(mask[:, None, :] > 0, logits, MASK_PADDING_VALUE)
    w = jax.nn.softmax(masked, axis=-1)
    return jnp.einsum("bgl,bld->bgd", w, keys)


def _setup(B=6, G=5, L=13, Dk=40, Dq=40, seed=0):
    rng = np.random.RandomState(seed)
    keys = jnp.asarray(rng.randn(B, L, Dk).astype(np.float32))
    query = jnp.asarray(rng.randn(B, G, Dq).astype(np.float32))
    lengths = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    mod = TargetAttention((16, 8), ("relu", "relu"), enable_bn=False)
    params = mod.init(jax.random.PRNGKey(1), query, keys, mask)["params"]
    return mod, params, query, keys, mask


@pytest.mark.slow
def test_split_equals_concat_forward():
    mod, params, query, keys, mask = _setup()
    got = mod.apply({"params": params}, query, keys, mask)
    want = manual_attention(params, query, keys, mask, (16, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_split_equals_concat_ungrouped():
    mod, params, query, keys, mask = _setup(G=1)
    q2 = query[:, 0]     # [B, Dq] ungrouped call
    got = mod.apply({"params": params}, q2, keys, mask)
    want = manual_attention(params, q2, keys, mask, (16, 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:, 0],
                               rtol=2e-5, atol=2e-6)


def test_split_equals_concat_grad():
    mod, params, query, keys, mask = _setup()

    def loss_new(p):
        return jnp.sum(mod.apply({"params": p}, query, keys, mask) ** 2)

    def loss_ref(p):
        return jnp.sum(manual_attention(p, query, keys, mask, (16, 8)) ** 2)

    g_new = jax.grad(loss_new)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_new = jax.tree_util.tree_flatten_with_path(g_new)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    for (pa, a), (pb, b) in zip(flat_new, flat_ref):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=str(pa))


def test_masked_positions_get_zero_weight():
    mod, params, query, keys, mask = _setup(seed=3)
    _, w = mod.apply({"params": params}, query, keys, mask,
                     return_weights=True)
    w = np.asarray(w)
    m = np.asarray(mask)
    assert np.all(w[np.broadcast_to(m[:, None, :], w.shape) == 0] < 1e-12)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
