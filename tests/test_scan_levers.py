"""Scan levers are identical math (ops/fused_clsr.py).

concat_scan_inputs re-slices the same values from one concatenated
array; remat_body recomputes the same body ops in the backward — both
must leave losses and gradients unchanged (up to recompute float
noise, which on CPU is exactly zero for the forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops.fused_clsr import FusedCLSREncoder

B, L, D, U, H = 8, 12, 12, 8, 8


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    hist = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.1)
    t_last = jnp.asarray(rng.rand(B, L).astype(np.float32))
    t_now = jnp.asarray(rng.rand(B, L).astype(np.float32))
    lengths = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    user_short = jnp.asarray(rng.randn(B, U).astype(np.float32) * 0.1)
    return hist, t_last, t_now, mask, user_short


@pytest.mark.parametrize("dtype", [
    pytest.param(None, marks=pytest.mark.slow),
    pytest.param(jnp.bfloat16, marks=pytest.mark.slow)])
def test_levers_identical_forward_and_grad(dtype):
    inputs = _inputs()
    base = FusedCLSREncoder(U, H, dtype=dtype, concat_scan_inputs=False,
                            remat_body=False)
    variables = base.init(jax.random.PRNGKey(0), *inputs)

    def loss_with(mod):
        def f(params, hist):
            h1, outs, h2 = mod.apply({"params": params}, hist, *inputs[1:])
            return (jnp.sum(h1) + jnp.sum(outs * outs) + jnp.sum(h2))
        return f

    ref_f = loss_with(base)
    v_ref, g_ref = jax.value_and_grad(ref_f, argnums=(0, 1))(
        variables["params"], inputs[0])

    variants = [dict(concat_scan_inputs=True, remat_body=False),
                dict(concat_scan_inputs=False, remat_body=True),
                dict(concat_scan_inputs=True, remat_body=True),
                dict(concat_scan_inputs=True, custom_vjp_scan=True)]
    for kw in variants:
        mod = FusedCLSREncoder(U, H, dtype=dtype, **kw)
        v, g = jax.value_and_grad(loss_with(mod), argnums=(0, 1))(
            variables["params"], inputs[0])
        np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-6)
        # the custom VJP accumulates weight grads in ONE f32 einsum;
        # under bf16 compute, autodiff instead sums per-step bf16
        # partials — same math, bf16-reassociation-level differences
        # (~1 ulp abs) on the kernels
        loose = (dtype is not None) and kw.get("custom_vjp_scan")
        rtol, atol = (2e-2, 2e-3) if loose else (2e-5, 1e-6)
        for (pa, a), (pb, bb) in zip(
                jax.tree_util.tree_flatten_with_path(g)[0],
                jax.tree_util.tree_flatten_with_path(g_ref)[0]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(bb, np.float32),
                rtol=rtol, atol=atol, err_msg=f"{kw} {pa}")
