"""Fused CLSR recurrent encoder.

The CLSR forward runs THREE independent recurrences over the same history
(clsr.py:161,194,230): the interest-evolution GRU (initial state = user
short embedding), the Time4LSTM (or plain GRU/LSTM) encoder, and the
"causal2" GRU feeding the fusion gate.  The reference — and a naive port —
executes them as three sequential length-L loops.

This module computes identical math in ONE `lax.scan`:
  * all input-only projections for all three cells are hoisted into a
    single [B*L, D] x [D, K] matmul (one MXU pass over the history),
  * the scan carry is the concatenation of the three cells' states, so the
    loop runs L iterations instead of 3L — in both the forward and the
    (autodiff'd) backward pass.

Cell math matches ops/rnn.py (which matches TF1) exactly; see
tests/test_fused_clsr.py for the parameter-for-parameter differential test.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Optional

import functools

from clsr_tpu.ops.initializers import tf1_glorot_uniform
from clsr_tpu.ops.rnn import _cast, _f32, _to_batch_major, _to_time_major


def _bd_step(carry, inp, Wg, Wc, g1_bc, g2_bc, U, H, dt):
    """One blockdiag fused step on a CONCATENATED input slice.

    Same math as FusedCLSREncoder._scan_blockdiag's body (kept in sync
    there via the differential tests); factored out so the custom-VJP
    scan below can re-derive per-step adjoints with jax.vjp."""
    h1, c, m, h2 = carry
    GW = 2 * U + 6 * H
    CW = U + H
    o1 = GW + CW
    xg_t = inp[:, :GW]
    xc_t = inp[:, GW:o1]
    tn_t = inp[:, o1:o1 + H]
    tl_t = inp[:, o1 + H:o1 + 2 * H]
    ot_t = inp[:, o1 + 2 * H:o1 + 3 * H]
    mt = inp[:, o1 + 3 * H].astype(jnp.float32)[:, None]

    Z = jnp.concatenate([h1, m, h2], axis=-1)
    ga = _f32(xg_t + _cast(Z, dt) @ Wg, dt)
    r1, u1 = jnp.split(jax.nn.sigmoid(ga[:, :2 * U]), 2, axis=-1)
    i, j, f, o = jnp.split(ga[:, 2 * U:2 * U + 4 * H], 4, axis=-1)
    r2, u2 = jnp.split(jax.nn.sigmoid(ga[:, 2 * U + 4 * H:]), 2, axis=-1)

    o = o + _f32(ot_t, dt)
    c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(_f32(tl_t, dt)) * c
             + jax.nn.sigmoid(i) * jax.nn.sigmoid(_f32(tn_t, dt))
             * jnp.tanh(j))
    m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    c = mt * c_new + (1.0 - mt) * c
    m = mt * m_new + (1.0 - mt) * m

    Zc = jnp.concatenate([r1 * h1, r2 * h2], axis=-1)
    ca = _f32(xc_t + _cast(Zc, dt) @ Wc, dt)
    cand1 = jnp.tanh(ca[:, :U] + g1_bc)
    h1n = u1 * h1 + (1.0 - u1) * cand1
    h1 = mt * h1n + (1.0 - mt) * h1
    cand2 = jnp.tanh(ca[:, U:] + g2_bc)
    h2n = u2 * h2 + (1.0 - u2) * cand2
    h2 = mt * h2n + (1.0 - mt) * h2

    return (h1, c, m, h2), mt * m_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _bd_scan(U, H, dt, xs, carry0, Wg, Wc, g1_bc, g2_bc):
    """Blockdiag scan with a hand-shaped backward (scripts/
    bench_scan_overhead.py: the scan is per-iteration-latency-bound, so
    the backward's cost is set by how many stacked arrays it touches
    per step):

      * forward saves ONE concatenated [B, U+3H] carry residual per
        step (autodiff-of-checkpointed-body saves the 4 carry leaves +
        an input copy = 5);
      * the reverse scan derives per-step adjoints with jax.vjp of
        `_bd_step` (no hand-written cell math) but closes over Wg/Wc,
        so NO weight-gradient matmuls run inside the loop;
      * dWg/dWc are recovered OUTSIDE the loop from the identity
        d(Z@Wg) = d(xg_t) (they enter additively): each is one big
        [U+2H, L*B] x [L*B, GW] MXU pass over the stacked input
        cotangents, with Zc's gates recomputed vectorized.

    Returns (h1_final, h2_final, outs_time_major)."""
    def body(carry, x_t):
        return _bd_step(carry, x_t, Wg, Wc, g1_bc, g2_bc, U, H, dt)

    (h1, _, _, h2), outs = jax.lax.scan(body, carry0, xs)
    return h1, h2, outs


def _bd_scan_fwd(U, H, dt, xs, carry0, Wg, Wc, g1_bc, g2_bc):
    def body(carry, x_t):
        new_c, out = _bd_step(carry, x_t, Wg, Wc, g1_bc, g2_bc, U, H, dt)
        return new_c, (out, jnp.concatenate(carry, axis=-1))

    (h1, _, _, h2), (outs, carries) = jax.lax.scan(body, carry0, xs)
    return (h1, h2, outs), (xs, carries, Wg, Wc, g1_bc, g2_bc)


def _bd_scan_bwd(U, H, dt, res, cts):
    xs, carries, Wg, Wc, g1_bc, g2_bc = res
    dh1, dh2, douts = cts
    B = carries.shape[1]
    zero = jnp.zeros((B, H), jnp.float32)
    GW = 2 * U + 6 * H
    CW = U + H

    def split_carry(cat):
        return (cat[:, :U], cat[:, U:U + H],
                cat[:, U + H:U + 2 * H], cat[:, U + 2 * H:])

    def body(acc, inp):
        dcarry, db1, db2 = acc
        x_t, carry_cat, dout_t = inp
        carry_in = split_carry(carry_cat)

        def f(c_in, x, b1, b2):
            return _bd_step(c_in, x, Wg, Wc, b1, b2, U, H, dt)

        _, vjp_fn = jax.vjp(f, carry_in, x_t, g1_bc, g2_bc)
        dcarry_in, dx_t, db1_t, db2_t = vjp_fn((dcarry, dout_t))
        return (dcarry_in, db1 + db1_t, db2 + db2_t), dx_t

    acc0 = ((dh1, zero, zero, dh2),
            jnp.zeros_like(g1_bc), jnp.zeros_like(g2_bc))
    (dcarry0, db1, db2), dxs = jax.lax.scan(
        body, acc0, (xs, carries, douts), reverse=True)

    # hoisted weight grads: xg/xc enter the pre-cast sums additively, so
    # the stacked input cotangents ARE the matmul-output cotangents
    Z = jnp.concatenate(
        [carries[..., :U], carries[..., U + H:U + 2 * H],
         carries[..., U + 2 * H:]], axis=-1)
    Zdt = _cast(Z, dt)
    dWg = jnp.einsum("lbz,lbk->zk", Zdt, dxs[..., :GW],
                     preferred_element_type=jnp.float32).astype(Wg.dtype)
    ga = _f32(xs[..., :GW] + Zdt @ Wg, dt)
    r1 = jax.nn.sigmoid(ga[..., :U])
    r2 = jax.nn.sigmoid(ga[..., 2 * U + 4 * H:2 * U + 5 * H])
    Zc = _cast(jnp.concatenate(
        [r1 * carries[..., :U], r2 * carries[..., U + 2 * H:]], axis=-1),
        dt)
    dWc = jnp.einsum("lbz,lbk->zk", Zc, dxs[..., GW:GW + CW],
                     preferred_element_type=jnp.float32).astype(Wc.dtype)
    return dxs, dcarry0, dWg, dWc, db1, db2


_bd_scan.defvjp(_bd_scan_fwd, _bd_scan_bwd)


class FusedCLSREncoder(nn.Module):
    """One-scan (interest-evolve GRU + Time4LSTM + causal2 GRU).

    Returns (short_term_intention [B,U], rnn_outputs [B,L,H],
    causal2_state [B,H]).  Only sequential_model='time4lstm' is fused (the
    taobao/kuaishou configs); other settings fall back to the unfused path
    in the model.
    """

    user_dim: int
    hidden_size: int
    interest_evolve: bool = True
    predict_long_short: bool = True
    use_pallas: bool = False   # hand-written TPU kernel (ops/pallas_scan.py)
    dtype: "Optional[jnp.dtype]" = None  # bf16 matmuls, f32 carry/gates
    unroll: int = 1                      # lax.scan unroll factor
    # one block-diagonal MXU pass for all three cells' carry-gate matmuls
    # (and one for the two GRU candidate matmuls) instead of six small
    # [B, 40]x[40, .] matmuls per scan step.  The zero off-blocks
    # contribute exact 0.0 terms, so the math is identical (x + 0.0 == x
    # for finite x); only active when all three cells run.
    fuse_cell_matmuls: bool = True
    # scan the six per-step input arrays as ONE concatenated [L, B, K]
    # array: each scanned array costs ~0.5us/iter of dynamic-slice
    # latency on this chip (scripts/bench_scan_overhead.py — the scan is
    # per-iteration-overhead-bound, floor ~5us/iter), so one slice per
    # step instead of six is a measured win.  Slices of the concat are
    # bit-identical to the separate arrays; only the blockdiag scan uses
    # it (the per-cell fallback path keeps separate arrays).
    concat_scan_inputs: bool = True
    # wrap the scan BODY in jax.checkpoint: the backward then saves only
    # the per-step carry + input slice (2 stacked residual arrays)
    # instead of every body intermediate (~12 stacked arrays), trading
    # ~one extra body recompute per backward iteration for most of the
    # per-iteration residual DUS/DS latency (the scan is
    # per-iteration-overhead-bound, scripts/bench_scan_overhead.py).
    # NOT the same as jax.checkpoint around the whole encoder (which
    # reruns the entire sequential scan in the backward and loses,
    # docs/RESULTS_r2.md).  Only affects the blockdiag scan.  Measured
    # (scripts/bench_scan.py, Kuaishou shapes): grad -28% f32 / -34%
    # bf16 — default on.
    remat_body: bool = True
    # hand-shaped custom VJP for the blockdiag scan (_bd_scan): one
    # concatenated carry residual per step, per-step adjoints via
    # jax.vjp of the shared step, weight grads hoisted out of the
    # reverse loop as two big MXU matmuls.  Identical math; requires
    # concat_scan_inputs.  MEASURED (scripts/bench_scan.py f32cv /
    # bf16cv, B=256 L=250): f32 4.87ms = parity with remat_body
    # (4.89), bf16 3.53ms loses 9% to remat_body (3.23) — the reverse
    # loop still touches the same number of stacked arrays per
    # iteration, which is the binding cost.  Stays default-off.
    custom_vjp_scan: bool = False

    @nn.compact
    def __call__(self, hist: jnp.ndarray, t_last: jnp.ndarray,
                 t_now: jnp.ndarray, mask: jnp.ndarray,
                 user_short: jnp.ndarray):
        B, L, D = hist.shape
        U, H = self.user_dim, self.hidden_size

        # --- params (same shapes/inits as the unfused modules) ----------
        # interest-evolve GRU (hidden U)
        g1_Wg = self.param("stint_gate_kernel", tf1_glorot_uniform,
                           (D + U, 2 * U))
        g1_bg = self.param("stint_gate_bias", nn.initializers.ones, (2 * U,))
        g1_Wc = self.param("stint_cand_kernel", tf1_glorot_uniform,
                           (D + U, U))
        g1_bc = self.param("stint_cand_bias", nn.initializers.zeros, (U,))
        # Time4LSTM
        w_tn = self.param("t4l_time_input_w1", tf1_glorot_uniform, (H,))
        b_tn = self.param("t4l_time_input_bias1", nn.initializers.zeros, (H,))
        w_tl = self.param("t4l_time_input_w2", tf1_glorot_uniform, (H,))
        b_tl = self.param("t4l_time_input_bias2", nn.initializers.zeros, (H,))
        Wk1 = self.param("t4l_time_kernel_w1", tf1_glorot_uniform, (D, H))
        T1 = self.param("t4l_time_kernel_t1", tf1_glorot_uniform, (H, H))
        tb1 = self.param("t4l_time_bias1", nn.initializers.zeros, (H,))
        Wk2 = self.param("t4l_time_kernel_w2", tf1_glorot_uniform, (D, H))
        T2 = self.param("t4l_time_kernel_t2", tf1_glorot_uniform, (H, H))
        tb2 = self.param("t4l_time_bias2", nn.initializers.zeros, (H,))
        Ot1 = self.param("t4l_o_kernel_t1", tf1_glorot_uniform, (H, H))
        Ot2 = self.param("t4l_o_kernel_t2", tf1_glorot_uniform, (H, H))
        t4l_W = self.param("t4l_kernel", tf1_glorot_uniform, (D + H, 4 * H))
        t4l_b = self.param("t4l_bias", nn.initializers.zeros, (4 * H,))
        # causal2 GRU (hidden H)
        g2_Wg = self.param("causal2_gate_kernel", tf1_glorot_uniform,
                           (D + H, 2 * H))
        g2_bg = self.param("causal2_gate_bias", nn.initializers.ones,
                           (2 * H,))
        g2_Wc = self.param("causal2_cand_kernel", tf1_glorot_uniform,
                           (D + H, H))
        g2_bc = self.param("causal2_cand_bias", nn.initializers.zeros, (H,))

        # --- one fused input projection over the whole history ----------
        # widths: [2U, U | 4H | 2H, H]
        dt = self.dtype
        x_kernel = jnp.concatenate(
            [g1_Wg[:D], g1_Wc[:D], t4l_W[:D], g2_Wg[:D], g2_Wc[:D]], axis=1)
        hist_c = _cast(hist, dt)
        x_proj = jnp.einsum("bld,dk->blk", hist_c, _cast(x_kernel, dt))
        s0, s1, s2, s3, s4 = 2 * U, 3 * U, 3 * U + 4 * H, 3 * U + 6 * H, \
            3 * U + 7 * H
        xg1 = x_proj[..., :s0] + _cast(g1_bg, dt)
        xc1 = x_proj[..., s0:s1]
        xw = x_proj[..., s1:s2] + _cast(t4l_b, dt)
        xg2 = x_proj[..., s2:s3] + _cast(g2_bg, dt)
        xc2 = x_proj[..., s3:s4]

        # Time4LSTM input-only time terms (see ops/rnn.py Time4LSTM)
        tn_in = _cast(jnp.tanh(t_now[..., None] * w_tn + b_tn), dt)
        tl_in = _cast(jnp.tanh(t_last[..., None] * w_tl + b_tl), dt)
        tn_state = (jnp.einsum("bld,dh->blh", hist_c, _cast(Wk1, dt))
                    + jnp.einsum("blh,hk->blk", tn_in, _cast(T1, dt))
                    + _cast(tb1, dt))
        tl_state = (jnp.einsum("bld,dh->blh", hist_c, _cast(Wk2, dt))
                    + jnp.einsum("blh,hk->blk", tl_in, _cast(T2, dt))
                    + _cast(tb2, dt))
        o_time = (jnp.einsum("blh,hk->blk", tn_in, _cast(Ot1, dt))
                  + jnp.einsum("blh,hk->blk", tl_in, _cast(Ot2, dt)))

        g1_Whg, g1_Whc = _cast(g1_Wg[D:], dt), _cast(g1_Wc[D:], dt)
        t4l_Wh = _cast(t4l_W[D:], dt)
        g2_Whg, g2_Whc = _cast(g2_Wg[D:], dt), _cast(g2_Wc[D:], dt)

        run_g1 = self.interest_evolve
        run_g2 = self.predict_long_short

        if self.use_pallas and run_g1 and run_g2 and dt is None:
            from clsr_tpu.ops.pallas_scan import fused_scan
            # kernel contract: candidate biases folded into the projections
            h1_f, outs, h2_f = fused_scan(
                xg1, xc1 + g1_bc, xw, tn_state, tl_state, o_time,
                xg2, xc2 + g2_bc, mask, user_short,
                g1_Whg, g1_Whc, t4l_Wh, g2_Whg, g2_Whc)
            return h1_f, outs, h2_f

        h1_0 = jnp.asarray(user_short, jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
        m0 = jnp.zeros((B, H), jnp.float32)
        h2_0 = jnp.zeros((B, H), jnp.float32)

        if self.fuse_cell_matmuls and run_g1 and run_g2:
            return self._scan_blockdiag(
                (xg1, xc1, xw, tn_state, tl_state, o_time, xg2, xc2),
                mask, (h1_0, c0, m0, h2_0),
                (g1_Whg, g1_Whc, t4l_Wh, g2_Whg, g2_Whc),
                (g1_bc, g2_bc), (U, H), dt)

        def step(carry, inp):
            h1, c, m, h2 = carry
            (xg1_t, xc1_t, xw_t, tn_t, tl_t, ot_t, xg2_t, xc2_t, m_t) = inp
            mt = m_t[:, None]

            if run_g1:
                gates1 = jax.nn.sigmoid(
                    _f32(xg1_t + _cast(h1, dt) @ g1_Whg, dt))
                r1, u1 = jnp.split(gates1, 2, axis=-1)
                cand1 = jnp.tanh(
                    _f32(xc1_t + _cast(r1 * h1, dt) @ g1_Whc, dt) + g1_bc)
                h1n = u1 * h1 + (1.0 - u1) * cand1
                h1 = mt * h1n + (1.0 - mt) * h1

            mat = _f32(xw_t + _cast(m, dt) @ t4l_Wh, dt)
            i, j, f, o = jnp.split(mat, 4, axis=-1)
            o = o + _f32(ot_t, dt)
            c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(_f32(tl_t, dt))
                     * c
                     + jax.nn.sigmoid(i) * jax.nn.sigmoid(_f32(tn_t, dt))
                     * jnp.tanh(j))
            m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            c = mt * c_new + (1.0 - mt) * c
            m = mt * m_new + (1.0 - mt) * m

            if run_g2:
                gates2 = jax.nn.sigmoid(
                    _f32(xg2_t + _cast(h2, dt) @ g2_Whg, dt))
                r2, u2 = jnp.split(gates2, 2, axis=-1)
                cand2 = jnp.tanh(
                    _f32(xc2_t + _cast(r2 * h2, dt) @ g2_Whc, dt) + g2_bc)
                h2n = u2 * h2 + (1.0 - u2) * cand2
                h2 = mt * h2n + (1.0 - mt) * h2

            return (h1, c, m, h2), mt * m_new

        (h1_f, _, _, h2_f), outs = jax.lax.scan(
            step, (h1_0, c0, m0, h2_0),
            tuple(_to_time_major(x) for x in
                  (xg1, xc1, xw, tn_state, tl_state, o_time, xg2, xc2))
            + (_to_time_major(mask),), unroll=self.unroll)

        return h1_f, _to_batch_major(outs), h2_f

    def _scan_blockdiag(self, projs, mask, carry0, Ws, cand_biases,
                        dims, dt):
        """The same scan with the carry matmuls fused block-diagonally.

        Per step the three cells' gate matmuls (h1@Whg1 [U,2U], m@t4l_Wh
        [H,4H], h2@Whg2 [H,2H]) become ONE [B, U+2H] x [U+2H, 2U+6H]
        matmul against a block-diagonal weight, and the two GRU candidate
        matmuls become one [B, U+H] x [U+H, U+H].  Zero off-blocks add
        exact 0.0 terms, so outputs are identical to the unfused step
        (differential-tested in tests/test_fused_clsr.py); the MXU runs
        2 passes per step instead of 6 under-sized ones.
        """
        xg1, xc1, xw, tn_state, tl_state, o_time, xg2, xc2 = projs
        g1_Whg, g1_Whc, t4l_Wh, g2_Whg, g2_Whc = Ws
        g1_bc, g2_bc = cand_biases
        U, H = dims
        h1_0, c0, m0, h2_0 = carry0

        GW = 2 * U + 6 * H
        Wg = jnp.zeros((U + 2 * H, GW), g1_Whg.dtype)
        Wg = Wg.at[:U, :2 * U].set(g1_Whg)
        Wg = Wg.at[U:U + H, 2 * U:2 * U + 4 * H].set(t4l_Wh)
        Wg = Wg.at[U + H:, 2 * U + 4 * H:].set(g2_Whg)
        Wc = jnp.zeros((U + H, U + H), g1_Whc.dtype)
        Wc = Wc.at[:U, :U].set(g1_Whc)
        Wc = Wc.at[U:, U:].set(g2_Whc)

        xgates = jnp.concatenate([xg1, xw, xg2], axis=-1)
        xcands = jnp.concatenate([xc1, xc2], axis=-1)
        GW_ = xgates.shape[-1]
        CW_ = xcands.shape[-1]
        H_ = tn_state.shape[-1]

        def unpack(inp):
            """Slice one concatenated per-step input back into the six
            logical arrays (bit-identical values)."""
            if not self.concat_scan_inputs:
                return inp
            o1 = GW_ + CW_
            return (inp[:, :GW_], inp[:, GW_:o1],
                    inp[:, o1:o1 + H_], inp[:, o1 + H_:o1 + 2 * H_],
                    inp[:, o1 + 2 * H_:o1 + 3 * H_],
                    inp[:, o1 + 3 * H_].astype(jnp.float32))

        def step(carry, inp):
            h1, c, m, h2 = carry
            xg_t, xc_t, tn_t, tl_t, ot_t, m_t = unpack(inp)
            mt = m_t[:, None]

            Z = jnp.concatenate([h1, m, h2], axis=-1)
            ga = _f32(xg_t + _cast(Z, dt) @ Wg, dt)
            r1, u1 = jnp.split(jax.nn.sigmoid(ga[:, :2 * U]), 2, axis=-1)
            i, j, f, o = jnp.split(ga[:, 2 * U:2 * U + 4 * H], 4, axis=-1)
            r2, u2 = jnp.split(jax.nn.sigmoid(ga[:, 2 * U + 4 * H:]), 2,
                               axis=-1)

            o = o + _f32(ot_t, dt)
            c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(_f32(tl_t, dt))
                     * c
                     + jax.nn.sigmoid(i) * jax.nn.sigmoid(_f32(tn_t, dt))
                     * jnp.tanh(j))
            m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            c = mt * c_new + (1.0 - mt) * c
            m = mt * m_new + (1.0 - mt) * m

            Zc = jnp.concatenate([r1 * h1, r2 * h2], axis=-1)
            ca = _f32(xc_t + _cast(Zc, dt) @ Wc, dt)
            cand1 = jnp.tanh(ca[:, :U] + g1_bc)
            h1n = u1 * h1 + (1.0 - u1) * cand1
            h1 = mt * h1n + (1.0 - mt) * h1
            cand2 = jnp.tanh(ca[:, U:] + g2_bc)
            h2n = u2 * h2 + (1.0 - u2) * cand2
            h2 = mt * h2n + (1.0 - mt) * h2

            return (h1, c, m, h2), mt * m_new

        if self.concat_scan_inputs:
            cat = jnp.concatenate(
                [xgates, xcands, tn_state, tl_state, o_time,
                 mask[..., None].astype(xgates.dtype)], axis=-1)
            xs = _to_time_major(cat)
            if self.custom_vjp_scan and self.unroll == 1:
                h1_f, h2_f, outs = _bd_scan(
                    U, H, dt, xs, (h1_0, c0, m0, h2_0),
                    Wg, Wc, g1_bc, g2_bc)
                return h1_f, _to_batch_major(outs), h2_f
        else:
            xs = (tuple(_to_time_major(x) for x in
                        (xgates, xcands, tn_state, tl_state, o_time))
                  + (_to_time_major(mask),))
        body = jax.checkpoint(step) if self.remat_body else step
        (h1_f, _, _, h2_f), outs = jax.lax.scan(
            body, (h1_0, c0, m0, h2_0), xs, unroll=self.unroll)

        return h1_f, _to_batch_major(outs), h2_f
