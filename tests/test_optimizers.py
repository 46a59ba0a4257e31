"""FTRL / ProximalAdagrad / ProximalGD update rules (training/optimizer.py).

Golden tests against numpy transcriptions of the published TF1 update
equations (tf.train.FtrlOptimizer / ProximalAdagradOptimizer /
ProximalGradientDescentOptimizer, the reference's optimizer options at
base_model.py:266-272), with TF1 defaults and with nonzero l1/l2.
"""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from clsr_tpu.config import Config
from clsr_tpu.training.optimizer import (build_optimizer, ftrl,
                                         proximal_adagrad, proximal_sgd)


def np_ftrl_run(w0, grads, lr, p=0.5, init_acc=0.1, l1=0.0, l2=0.0,
                beta=0.0):
    w = w0.copy()
    z = np.zeros_like(w)
    n = np.full_like(w, init_acc)
    for g in grads:
        n_new = n + g * g
        sigma = (n_new ** p - n ** p) / lr
        z = z + g - sigma * w
        denom = (beta + n_new ** p) / lr + 2.0 * l2
        w = np.where(np.abs(z) > l1, (np.sign(z) * l1 - z) / denom, 0.0)
        n = n_new
    return w


def np_padagrad_run(w0, grads, lr, init_acc=0.1, l1=0.0, l2=0.0):
    w = w0.copy()
    acc = np.full_like(w, init_acc)
    for g in grads:
        acc = acc + g * g
        lr_t = lr / np.sqrt(acc)
        prox = w - lr_t * g
        w = np.sign(prox) * np.maximum(np.abs(prox) - lr_t * l1, 0.0) \
            / (1.0 + lr_t * l2)
    return w


def _run_optax(tx, w0, grads):
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["w"])


@pytest.mark.parametrize("l1,l2", [(0.0, 0.0), (0.05, 0.02)])
def test_ftrl_matches_equations(l1, l2):
    rng = np.random.RandomState(0)
    w0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(4)]
    got = _run_optax(ftrl(0.1, l1=l1, l2=l2), w0, grads)
    want = np_ftrl_run(w0, grads, 0.1, l1=l1, l2=l2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("l1,l2", [(0.0, 0.0), (0.05, 0.02)])
def test_proximal_adagrad_matches_equations(l1, l2):
    rng = np.random.RandomState(1)
    w0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(4)]
    got = _run_optax(proximal_adagrad(0.1, l1=l1, l2=l2), w0, grads)
    want = np_padagrad_run(w0, grads, 0.1, l1=l1, l2=l2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_proximal_adagrad_reduces_to_adagrad():
    rng = np.random.RandomState(2)
    w0 = rng.randn(9).astype(np.float32)
    grads = [rng.randn(9).astype(np.float32) for _ in range(3)]
    got = _run_optax(proximal_adagrad(0.1), w0, grads)
    want = _run_optax(optax.adagrad(0.1), w0, grads)   # same 0.1 init acc
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_proximal_sgd_reduces_to_sgd():
    rng = np.random.RandomState(3)
    w0 = rng.randn(9).astype(np.float32)
    grads = [rng.randn(9).astype(np.float32) for _ in range(3)]
    got = _run_optax(proximal_sgd(0.1), w0, grads)
    want = _run_optax(optax.sgd(0.1), w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_proximal_sgd_l1_shrinks_to_zero():
    # large l1 drives small weights to exactly zero (proximal operator)
    w0 = np.array([0.01, -0.02, 5.0], np.float32)
    got = _run_optax(proximal_sgd(0.1, l1=10.0), w0,
                     [np.zeros(3, np.float32)])
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] != 0.0


@pytest.mark.parametrize("name", ["ftrl", "padagrad", "pgd"])
def test_build_optimizer_wires_real_rules(name):
    cfg = Config(model_type="gru4rec", user_vocab="u", item_vocab="i",
                 cate_vocab="c", optimizer=name, learning_rate=0.05,
                 is_clip_norm=False).validate()
    tx = build_optimizer(cfg)
    w0 = np.array([0.5, -0.5], np.float32)
    grads = [np.array([0.1, -0.2], np.float32)]
    got = _run_optax(tx, w0, grads)
    if name == "ftrl":
        want = np_ftrl_run(w0, grads, 0.05)
    elif name == "padagrad":
        want = np_padagrad_run(w0, grads, 0.05)
    else:
        want = w0 - 0.05 * grads[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
