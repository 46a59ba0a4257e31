"""Fused two-pass train-mode attention scorer (VERDICT r3 item 2b;
ops/pallas_attention.py:fused_train_attention).

Guarantees:
  * kernel forward == the pure-XLA train-mode scorer math (values AND
    the batch statistics), with and without BN, with L-block padding;
  * gradients through the custom VJP == jax.grad of the XLA math for
    every differentiable input (the rematerialized backward includes
    the through-batch-stats BN terms);
  * a full CLSR train step with use_pallas_train_attention='on' tracks
    the XLA-path step: same losses, params within Adam sign-flip
    noise, same BN running-statistics updates;
  * the gate composes with enable_bn=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops.pallas_attention import (_xla_train_scorer,
                                           fused_train_attention)
from tests.test_lazy_adam import _batch
from tests.test_mesh_compact import N_CATES, N_ITEMS, N_USERS, _build, _cfg


def _scorer_args(rng, B=4, L=13, G=5, D=12, Dk=16, H0=24, H1=8):
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    f = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)
    return (f(B, L, Dk), f(B, L, D), f(B, G, D), jnp.asarray(mask),
            f(4 * D, H0), f(H0), 1.0 + f(H0), f(H0),
            f(H0, H1), f(H1), 1.0 + f(H1), f(H1), f(H1))


@pytest.mark.parametrize("enable_bn", [True, False])
def test_kernel_matches_xla_scorer(enable_bn):
    rng = np.random.RandomState(0)
    args = _scorer_args(rng)
    ref = _xla_train_scorer(*args, enable_bn=enable_bn)
    got = fused_train_attention(*args, 8, None, True, enable_bn)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5, atol=2e-6)
    if enable_bn:
        for i in range(1, 5):
            np.testing.assert_allclose(got[i], ref[i], rtol=2e-5,
                                       atol=2e-6)


@pytest.mark.slow
def test_kernel_gradients_match_xla():
    rng = np.random.RandomState(1)
    args = _scorer_args(rng, L=17)   # 17 % 8 != 0: exercises L padding
    diff_idx = (0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12)

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_xla_train_scorer(*a)[0]))

    def loss_ker(*a):
        return jnp.sum(jnp.tanh(
            fused_train_attention(*a, 8, None, True, True)[0]))

    g_ref = jax.grad(loss_ref, argnums=diff_idx)(*args)
    g_ker = jax.grad(loss_ker, argnums=diff_idx)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"grad {diff_idx[i]}")


@pytest.mark.parametrize("enable_bn", [True, False])
def test_clsr_train_step_differential(enable_bn):
    """Full CLSR train steps, fused scorer vs XLA path: identical losses
    (float noise) and BN running stats; params within Adam sign-flip
    noise after one step."""
    from clsr_tpu.training.steps import make_train_step

    rng_np = np.random.RandomState(2)
    batches = [_batch(rng_np, N_ITEMS, N_CATES, N_USERS)
               for _ in range(3)]

    def run(flag):
        cfg = _cfg("clsr", enable_bn=enable_bn,
                   use_pallas_train_attention=flag)
        model, state = _build("clsr", cfg, batches[0])
        step = make_train_step(model, cfg, donate=False)
        losses = []
        states = []
        for i, b in enumerate(batches):
            state, parts = step(state, b, jax.random.PRNGKey(i))
            losses.append([float(parts.loss), float(parts.data_loss),
                           float(parts.contrastive_loss)])
            states.append(state)
        return losses, states

    l_x, s_x = run("off")
    l_k, s_k = run("on")
    np.testing.assert_allclose(l_k, l_x, rtol=5e-4, atol=1e-6)
    from tests.test_mesh_compact import _one_step_close
    _one_step_close(s_x[0].params, s_k[0].params, 0.001)
    # BN running stats after step 1 must match to float noise
    if enable_bn:
        fa = jax.tree_util.tree_flatten_with_path(s_x[0].batch_stats)[0]
        fb = jax.tree_util.tree_flatten_with_path(s_k[0].batch_stats)[0]
        assert len(fa) == len(fb) and len(fa) > 0
        for (pa, a), (pb, b) in zip(fa, fb):
            assert str(pa) == str(pb)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=str(pa))
