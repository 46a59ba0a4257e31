"""Pallas TPU kernel for the fused CLSR recurrence.

One kernel executes all L timesteps of the three CLSR recurrences
(interest-evolve GRU + Time4LSTM + causal2 GRU, see ops/fused_clsr.py):
the recurrent weights stay resident in VMEM for the whole sequence, the
per-timestep input projections stream in via the pallas grid pipeline
(auto double-buffered HBM->VMEM DMA), and the carries live in VMEM
scratch that persists across the sequential grid — no per-step XLA
while-loop overhead and no carry round-trips through HBM.

Grid: (B/Bt, L), L innermost/sequential.  Layout [Bt rows x lane-padded
feature] per step; the h-dependent [Bt,H]x[H,kH] products run on the MXU
with fp32 accumulation.

Differentiability: `fused_scan` carries a custom VJP whose backward
re-runs the (pure-jax, differentiable) reference scan — forward gets the
kernel, backward pays one recompute (standard remat trade).

All biases are folded into the streamed projections by the caller, so the
kernel takes exactly five weight matrices.

Status: correctness-validated (interpret-mode differential tests vs the
reference scan, gradient tests through the VJP) and compiled-path
benchmarked on v5e under the HONEST forced-sync protocol
(scripts/bench_pallas.py, docs/RESULTS_r2.md): at the CLSR dims
(B=512, H=40, L=50) the kernel is 10% SLOWER than XLA's fused lax.scan
(1.64ms vs 1.48ms per encoder forward) — the earlier "parity" note was
measured in the relay's enqueue-mirage mode.  The default path stays
`use_pallas_scan: False`; the kernel remains as the substrate for
larger-hidden-dim configurations where while-loop overhead and carry
HBM round-trips would start to matter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xg1_ref, xc1_ref, xw_ref, tn_ref, tl_ref, ot_ref, xg2_ref,
            xc2_ref, mask_ref, ushort_ref,
            whg1_ref, whc1_ref, wh4_ref, whg2_ref, whc2_ref,
            outs_ref, h1f_ref, h2f_ref,
            h1_s, c_s, m_s, h2_s):
    l = pl.program_id(1)
    n_l = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        h1_s[:] = ushort_ref[:]
        c_s[:] = jnp.zeros_like(c_s)
        m_s[:] = jnp.zeros_like(m_s)
        h2_s[:] = jnp.zeros_like(h2_s)

    h1 = h1_s[:]
    c = c_s[:]
    m = m_s[:]
    h2 = h2_s[:]
    mt = mask_ref[0]                       # [Bt, 1]

    U = h1.shape[-1]
    H = c.shape[-1]

    # interest-evolve GRU
    gates1 = jax.nn.sigmoid(
        xg1_ref[0] + jnp.dot(h1, whg1_ref[:],
                             preferred_element_type=jnp.float32))
    r1, u1 = gates1[:, :U], gates1[:, U:]
    cand1 = jnp.tanh(
        xc1_ref[0] + jnp.dot(r1 * h1, whc1_ref[:],
                             preferred_element_type=jnp.float32))
    h1n = u1 * h1 + (1.0 - u1) * cand1
    h1 = mt * h1n + (1.0 - mt) * h1

    # Time4LSTM
    mat = xw_ref[0] + jnp.dot(m, wh4_ref[:],
                              preferred_element_type=jnp.float32)
    i, j = mat[:, :H], mat[:, H:2 * H]
    f, o = mat[:, 2 * H:3 * H], mat[:, 3 * H:]
    o = o + ot_ref[0]
    c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(tl_ref[0]) * c
             + jax.nn.sigmoid(i) * jax.nn.sigmoid(tn_ref[0])
             * jnp.tanh(j))
    m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    c = mt * c_new + (1.0 - mt) * c
    m = mt * m_new + (1.0 - mt) * m

    # causal2 GRU
    gates2 = jax.nn.sigmoid(
        xg2_ref[0] + jnp.dot(h2, whg2_ref[:],
                             preferred_element_type=jnp.float32))
    r2, u2 = gates2[:, :H], gates2[:, H:]
    cand2 = jnp.tanh(
        xc2_ref[0] + jnp.dot(r2 * h2, whc2_ref[:],
                             preferred_element_type=jnp.float32))
    h2n = u2 * h2 + (1.0 - u2) * cand2
    h2 = mt * h2n + (1.0 - mt) * h2

    h1_s[:] = h1
    c_s[:] = c
    m_s[:] = m
    h2_s[:] = h2
    outs_ref[0] = mt * m_new

    @pl.when(l == n_l - 1)
    def _():
        h1f_ref[:] = h1
        h2f_ref[:] = h2


def _pallas_forward(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
                    whg1, whc1, wh4, whg2, whc2,
                    block_b: int = 256, interpret: bool = False):
    B, L, _ = xw.shape
    U = ushort.shape[-1]
    H = whc2.shape[-1]

    pad = (-B) % block_b
    if pad:
        padb = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        xg1, xc1, xw, tn, tl, ot, xg2, xc2, ushort = map(
            padb, (xg1, xc1, xw, tn, tl, ot, xg2, xc2, ushort))
        mask = jnp.pad(mask, [(0, pad), (0, 0)])
    Bp = B + pad

    # time-major [L, B, W] so blocks are (1, block_b, W): the TPU lowering
    # needs the last two block dims 8/128-aligned or full-size
    tmaj = lambda x: jnp.moveaxis(x, 1, 0)
    xg1, xc1, xw, tn, tl, ot, xg2, xc2 = map(
        tmaj, (xg1, xc1, xw, tn, tl, ot, xg2, xc2))
    mask3 = tmaj(mask)[..., None]               # [L, B, 1]

    seq_spec = lambda w: pl.BlockSpec(
        (1, block_b, w), lambda b, l: (l, b, 0),
        memory_space=pltpu.VMEM)
    row_spec = lambda w: pl.BlockSpec(
        (block_b, w), lambda b, l: (b, 0), memory_space=pltpu.VMEM)
    wt_spec = lambda r, c: pl.BlockSpec(
        (r, c), lambda b, l: (0, 0), memory_space=pltpu.VMEM)

    outs, h1f, h2f = pl.pallas_call(
        _kernel,
        grid=(Bp // block_b, L),
        in_specs=[
            seq_spec(2 * U), seq_spec(U), seq_spec(4 * H), seq_spec(H),
            seq_spec(H), seq_spec(H), seq_spec(2 * H), seq_spec(H),
            seq_spec(1),
            row_spec(U),
            wt_spec(U, 2 * U), wt_spec(U, U), wt_spec(H, 4 * H),
            wt_spec(H, 2 * H), wt_spec(H, H),
        ],
        out_specs=[
            seq_spec(H),                       # outs [L, B, H]
            row_spec(U),                       # h1 final
            row_spec(H),                       # h2 final
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, U), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, U), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask3, ushort,
      whg1, whc1, wh4, whg2, whc2)

    outs = jnp.moveaxis(outs, 0, 1)
    if pad:
        outs, h1f, h2f = outs[:B], h1f[:B], h2f[:B]
    return h1f, outs, h2f


def _scan_reference(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
                    whg1, whc1, wh4, whg2, whc2):
    """Pure-jax reference (identical math; used for the VJP backward)."""
    B, L, _ = xw.shape
    U = ushort.shape[-1]
    H = whc2.shape[-1]
    tm = lambda x: jnp.moveaxis(x, 1, 0)

    def step(carry, inp):
        h1, c, m, h2 = carry
        xg1_t, xc1_t, xw_t, tn_t, tl_t, ot_t, xg2_t, xc2_t, m_t = inp
        mt = m_t[:, None]
        gates1 = jax.nn.sigmoid(xg1_t + h1 @ whg1)
        r1, u1 = gates1[:, :U], gates1[:, U:]
        cand1 = jnp.tanh(xc1_t + (r1 * h1) @ whc1)
        h1 = mt * (u1 * h1 + (1 - u1) * cand1) + (1 - mt) * h1
        mat = xw_t + m @ wh4
        i, j = mat[:, :H], mat[:, H:2 * H]
        f, o = mat[:, 2 * H:3 * H], mat[:, 3 * H:]
        o = o + ot_t
        c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(tl_t) * c
                 + jax.nn.sigmoid(i) * jax.nn.sigmoid(tn_t) * jnp.tanh(j))
        m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        c = mt * c_new + (1 - mt) * c
        m = mt * m_new + (1 - mt) * m
        gates2 = jax.nn.sigmoid(xg2_t + h2 @ whg2)
        r2, u2 = gates2[:, :H], gates2[:, H:]
        cand2 = jnp.tanh(xc2_t + (r2 * h2) @ whc2)
        h2 = mt * (u2 * h2 + (1 - u2) * cand2) + (1 - mt) * h2
        return (h1, c, m, h2), mt * m_new

    carry0 = (ushort, jnp.zeros((B, H)), jnp.zeros((B, H)),
              jnp.zeros((B, H)))
    (h1f, _, _, h2f), outs = jax.lax.scan(
        step, carry0,
        tuple(tm(x) for x in (xg1, xc1, xw, tn, tl, ot, xg2, xc2))
        + (tm(mask),))
    return h1f, jnp.moveaxis(outs, 0, 1), h2f


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16))
def fused_scan(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
               whg1, whc1, wh4, whg2, whc2,
               block_b: int = 256, interpret: bool = False):
    return _pallas_forward(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask,
                           ushort, whg1, whc1, wh4, whg2, whc2,
                           block_b=block_b, interpret=interpret)


def _fwd(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
         whg1, whc1, wh4, whg2, whc2, block_b, interpret):
    out = _pallas_forward(xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
                          whg1, whc1, wh4, whg2, whc2,
                          block_b=block_b, interpret=interpret)
    return out, (xg1, xc1, xw, tn, tl, ot, xg2, xc2, mask, ushort,
                 whg1, whc1, wh4, whg2, whc2)


def _bwd(block_b, interpret, res, g):
    _, vjp = jax.vjp(_scan_reference, *res)
    return vjp(g)


fused_scan.defvjp(_fwd, _bwd)
