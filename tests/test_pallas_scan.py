"""Pallas fused-recurrence kernel vs the pure-jax reference scan.

Runs in interpreter mode on the CPU test mesh; the compiled path is
exercised by scripts/bench_pallas.py on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops import pallas_scan

B, L, U, H = 12, 9, 5, 7


def _args(seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    lengths = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    return dict(
        xg1=f(B, L, 2 * U), xc1=f(B, L, U), xw=f(B, L, 4 * H),
        tn=f(B, L, H), tl=f(B, L, H), ot=f(B, L, H),
        xg2=f(B, L, 2 * H), xc2=f(B, L, H), mask=mask, ushort=f(B, U),
        whg1=f(U, 2 * U), whc1=f(U, U), wh4=f(H, 4 * H),
        whg2=f(H, 2 * H), whc2=f(H, H),
    )


def test_kernel_matches_reference():
    a = _args()
    ref = pallas_scan._scan_reference(*a.values())
    out = pallas_scan.fused_scan(*a.values(), 8, True)  # block_b=8, interpret
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)


def test_kernel_pads_odd_batch():
    a = _args(1)
    out = pallas_scan.fused_scan(*a.values(), 16, True)  # 12 rows, block 16
    ref = pallas_scan._scan_reference(*a.values())
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)


ORDER = ("xg1", "xc1", "xw", "tn", "tl", "ot", "xg2", "xc2", "mask",
         "ushort", "whg1", "whc1", "wh4", "whg2", "whc2")


def test_gradients_flow_through_vjp():
    # NOTE: jax flattens dicts in sorted-key order, so ordering must be
    # explicit when splatting through a transform
    a = _args(2)

    def loss_pallas(args):
        h1, outs, h2 = pallas_scan.fused_scan(
            *(args[k] for k in ORDER), 8, True)
        return jnp.sum(h1 ** 2) + jnp.sum(outs ** 2) + jnp.sum(h2 ** 2)

    def loss_ref(args):
        h1, outs, h2 = pallas_scan._scan_reference(
            *(args[k] for k in ORDER))
        return jnp.sum(h1 ** 2) + jnp.sum(outs ** 2) + jnp.sum(h2 ** 2)

    g1 = jax.grad(loss_pallas)(a)
    g2 = jax.grad(loss_ref)(a)
    for k in a:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-4, err_msg=k)
