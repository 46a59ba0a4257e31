"""Fused one-scan CLSR encoder == three separate scans, param for param."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops.fused_clsr import FusedCLSREncoder
from clsr_tpu.ops.rnn import GRU, Time4LSTM

B, L, D, U, H = 4, 9, 6, 5, 7


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    hist = rng.randn(B, L, D).astype(np.float32)
    t_last = rng.rand(B, L).astype(np.float32)
    t_now = rng.rand(B, L).astype(np.float32)
    lengths = [9, 6, 3, 1]
    mask = (np.arange(L)[None, :] < np.array(lengths)[:, None]).astype(np.float32)
    user_short = rng.randn(B, U).astype(np.float32)
    return (jnp.array(hist), jnp.array(t_last), jnp.array(t_now),
            jnp.array(mask), jnp.array(user_short))


@pytest.mark.slow
def test_fused_matches_unfused():
    hist, t_last, t_now, mask, user_short = _inputs()

    fused = FusedCLSREncoder(U, H)
    fvars = fused.init(jax.random.PRNGKey(0), hist, t_last, t_now, mask,
                       user_short)
    fp = fvars["params"]

    # rebuild the three unfused modules from the fused parameters
    g1 = GRU(U)
    g1_params = {"gate_kernel": fp["stint_gate_kernel"],
                 "gate_bias": fp["stint_gate_bias"],
                 "cand_kernel": fp["stint_cand_kernel"],
                 "cand_bias": fp["stint_cand_bias"]}
    t4l = Time4LSTM(H)
    t4l_params = {k[len("t4l_"):]: v for k, v in fp.items()
                  if k.startswith("t4l_")}
    g2 = GRU(H)
    g2_params = {"gate_kernel": fp["causal2_gate_kernel"],
                 "gate_bias": fp["causal2_gate_bias"],
                 "cand_kernel": fp["causal2_cand_kernel"],
                 "cand_bias": fp["causal2_cand_bias"]}

    h1_f, outs_f, h2_f = fused.apply(fvars, hist, t_last, t_now, mask,
                                     user_short)
    _, h1_u = g1.apply({"params": g1_params}, hist, mask,
                       init_state=user_short)
    outs_u, _ = t4l.apply({"params": t4l_params}, hist, t_last, t_now, mask)
    _, h2_u = g2.apply({"params": g2_params}, hist, mask)

    np.testing.assert_allclose(np.asarray(h1_f), np.asarray(h1_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs_f), np.asarray(outs_u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2_f), np.asarray(h2_u), atol=1e-5)


def test_fused_gradients_match():
    hist, t_last, t_now, mask, user_short = _inputs(1)
    fused = FusedCLSREncoder(U, H)
    fvars = fused.init(jax.random.PRNGKey(0), hist, t_last, t_now, mask,
                       user_short)

    def loss_fused(params):
        h1, outs, h2 = fused.apply({"params": params}, hist, t_last, t_now,
                                   mask, user_short)
        return (jnp.sum(h1 ** 2) + jnp.sum(outs ** 2) + jnp.sum(h2 ** 2))

    fp = fvars["params"]
    g = jax.grad(loss_fused)(fp)

    # same loss through the unfused modules with shared parameters
    g1, t4l, g2 = GRU(U), Time4LSTM(H), GRU(H)

    def loss_unfused(params):
        g1_params = {"gate_kernel": params["stint_gate_kernel"],
                     "gate_bias": params["stint_gate_bias"],
                     "cand_kernel": params["stint_cand_kernel"],
                     "cand_bias": params["stint_cand_bias"]}
        t4l_params = {k[4:]: v for k, v in params.items()
                      if k.startswith("t4l_")}
        g2_params = {"gate_kernel": params["causal2_gate_kernel"],
                     "gate_bias": params["causal2_gate_bias"],
                     "cand_kernel": params["causal2_cand_kernel"],
                     "cand_bias": params["causal2_cand_bias"]}
        _, h1 = g1.apply({"params": g1_params}, hist, mask,
                         init_state=user_short)
        outs, _ = t4l.apply({"params": t4l_params}, hist, t_last, t_now,
                            mask)
        _, h2 = g2.apply({"params": g2_params}, hist, mask)
        return (jnp.sum(h1 ** 2) + jnp.sum(outs ** 2) + jnp.sum(h2 ** 2))

    g_ref = jax.grad(loss_unfused)(fp)
    for k in g:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                   atol=2e-4, err_msg=k)


def test_blockdiag_matches_per_cell_matmuls():
    """fuse_cell_matmuls=True (one block-diagonal MXU pass per step) is
    numerically identical to the six per-cell matmuls: the off-diagonal
    zero blocks contribute exact 0.0 addends."""
    hist, t_last, t_now, mask, user_short = _inputs(3)
    a = FusedCLSREncoder(U, H, fuse_cell_matmuls=True)
    b = FusedCLSREncoder(U, H, fuse_cell_matmuls=False)
    v = a.init(jax.random.PRNGKey(4), hist, t_last, t_now, mask, user_short)
    outs_a = a.apply(v, hist, t_last, t_now, mask, user_short)
    outs_b = b.apply(v, hist, t_last, t_now, mask, user_short)
    for xa, xb in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-7)

    ga = jax.grad(lambda p: sum(jnp.sum(o ** 2) for o in a.apply(
        {"params": p}, hist, t_last, t_now, mask, user_short)))(v["params"])
    gb = jax.grad(lambda p: sum(jnp.sum(o ** 2) for o in b.apply(
        {"params": p}, hist, t_last, t_now, mask, user_short)))(v["params"])
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   atol=1e-5, err_msg=k)


def test_flags_disable_branches():
    hist, t_last, t_now, mask, user_short = _inputs(2)
    mod = FusedCLSREncoder(U, H, interest_evolve=False,
                           predict_long_short=False)
    v = mod.init(jax.random.PRNGKey(0), hist, t_last, t_now, mask,
                 user_short)
    h1, outs, h2 = mod.apply(v, hist, t_last, t_now, mask, user_short)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(user_short))
    assert np.all(np.asarray(h2) == 0)
