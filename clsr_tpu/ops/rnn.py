"""Recurrent encoders as `lax.scan` kernels.

TPU-native redesign of the reference's TF1 cells + forked dynamic_rnn
(rnn_cell_implement.py:46-708, rnn_dien.py:439-753):

  * Input projections are hoisted OUT of the recurrence: one big [B*L, D] x
    [D, k*H] matmul feeds the MXU, and the scan body only carries the
    h-dependent [B, H] x [H, k*H] product.  For Time4LSTM the entire
    time-gating path (both tanh time embeddings, both time states, and the
    output-gate time term) is input-only and precomputed — the reference
    recomputes all of it per step inside the tf.while_loop.
  * Variable-length sequences use carry-through masking, reproducing
    `dynamic_rnn(sequence_length=...)` semantics (rnn_dien.py:139-267
    `_rnn_step`): outputs are zero past a row's length and the final state
    is the state at t = length-1.
  * Cell math matches TF1 exactly:
      GRU     — gates sigmoid([x,h]Wg + bg(init 1)), candidate
                tanh([x, r*h]Wc + bc), h' = u*h + (1-u)*c.
      LSTM    — i,j,f,o = split([x,m]W + b); c' = sig(f+1)c + sig(i)tanh(j);
                m' = sig(o)tanh(c').
      Time4LSTM — rnn_cell_implement.py:129-298: two learned time embeddings
                gate the forget/input paths, time terms add into the output
                gate.  Takes `t_last` (= time_from_first_action) and `t_now`
                (= time_to_now) per the CLSR wiring (clsr.py:179-200, cell
                reads inputs[:,-2]/-1]).
      VecAttGRU — rnn_cell_implement.py:558-623 (DIEN): update gate scaled
                by the external attention score, u = (1-att)*u.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clsr_tpu.ops.initializers import tf1_glorot_uniform


def _cast(a, dt):
    """Cast to the compute dtype when mixed precision is on (dt=None: id).

    bf16 policy for recurrences: the hoisted input projections and the
    per-step h@W matmuls run in bf16 (MXU rate, half the scan's memory
    traffic); gate nonlinearities and the carried state stay float32.
    """
    return a if dt is None else a.astype(dt)


def _f32(a, dt):
    return a if dt is None else a.astype(jnp.float32)


def _masked_scan(step_fn, carry0, xs_time_major, mask_time_major,
                 unroll: int = 1):
    """Run `step_fn` over time with carry-through masking.

    step_fn(carry, x_t) -> (new_carry, out_t); mask is [L, B].
    Carry leaves are [B, H]-shaped; outputs are zeroed past seq length.
    `unroll` > 1 unrolls that many iterations per XLA while-loop step
    (identical math; less loop overhead for long L).
    """

    def body(carry, inp):
        x_t, m_t = inp
        new_carry, out_t = step_fn(carry, x_t)
        m = m_t[:, None]
        blended = jax.tree_util.tree_map(
            lambda new, old: m * new + (1.0 - m) * old, new_carry, carry
        )
        return blended, m * out_t

    final, outs = jax.lax.scan(body, carry0, (xs_time_major, mask_time_major),
                               unroll=unroll)
    return final, outs


def _to_time_major(x):
    return jnp.moveaxis(x, 1, 0)


def _to_batch_major(x):
    return jnp.moveaxis(x, 0, 1)


class GRU(nn.Module):
    """TF1-parity GRU over [B, L, D] with masking.

    Returns (outputs [B, L, H], final_state [B, H]).
    """

    hidden_size: int
    dtype: Optional[jnp.dtype] = None   # bf16 matmuls, f32 carry/gates
    unroll: int = 1                     # lax.scan unroll factor

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 init_state: Optional[jnp.ndarray] = None):
        B, L, D = x.shape
        H = self.hidden_size
        dt = self.dtype
        Wg = self.param("gate_kernel", tf1_glorot_uniform, (D + H, 2 * H))
        bg = self.param("gate_bias", nn.initializers.ones, (2 * H,))
        Wc = self.param("cand_kernel", tf1_glorot_uniform, (D + H, H))
        bc = self.param("cand_bias", nn.initializers.zeros, (H,))

        xg = jnp.einsum("bld,dk->blk", _cast(x, dt), _cast(Wg[:D], dt)) \
            + _cast(bg, dt)
        xc = jnp.einsum("bld,dk->blk", _cast(x, dt), _cast(Wc[:D], dt))
        Whg, Whc = _cast(Wg[D:], dt), _cast(Wc[D:], dt)

        h0 = (init_state if init_state is not None
              else jnp.zeros((B, H), jnp.float32))

        def step(h, inp):
            xg_t, xc_t = inp
            gates = jax.nn.sigmoid(_f32(xg_t + _cast(h, dt) @ Whg, dt))
            r, u = jnp.split(gates, 2, axis=-1)
            c = jnp.tanh(_f32(xc_t + _cast(r * h, dt) @ Whc, dt) + bc)
            h_new = u * h + (1.0 - u) * c
            return h_new, h_new

        final, outs = _masked_scan(
            step, h0,
            (_to_time_major(xg), _to_time_major(xc)),
            _to_time_major(mask), unroll=self.unroll,
        )
        return _to_batch_major(outs), final


class LSTM(nn.Module):
    """TF1-parity basic LSTMCell (no peepholes), forget_bias=1.0."""

    hidden_size: int
    dtype: Optional[jnp.dtype] = None   # bf16 matmuls, f32 carry/gates
    unroll: int = 1                     # lax.scan unroll factor

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 init_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        B, L, D = x.shape
        H = self.hidden_size
        dt = self.dtype
        W = self.param("kernel", tf1_glorot_uniform, (D + H, 4 * H))
        b = self.param("bias", nn.initializers.zeros, (4 * H,))

        xw = jnp.einsum("bld,dk->blk", _cast(x, dt), _cast(W[:D], dt)) \
            + _cast(b, dt)
        Wh = _cast(W[D:], dt)

        if init_state is None:
            init_state = (jnp.zeros((B, H), jnp.float32),
                          jnp.zeros((B, H), jnp.float32))

        def step(carry, xw_t):
            c, m = carry
            mat = _f32(xw_t + _cast(m, dt) @ Wh, dt)
            i, j, f, o = jnp.split(mat, 4, axis=-1)
            c_new = (jax.nn.sigmoid(f + 1.0) * c
                     + jax.nn.sigmoid(i) * jnp.tanh(j))
            m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (c_new, m_new), m_new

        (c_f, m_f), outs = _masked_scan(
            step, init_state, _to_time_major(xw), _to_time_major(mask),
            unroll=self.unroll,
        )
        return _to_batch_major(outs), (c_f, m_f)


class Time4LSTM(nn.Module):
    """Time-aware LSTM (rnn_cell_implement.py:46-298).

    `t_last` / `t_now` are the per-step scalar time features the reference
    concatenates onto the input (clsr.py:179-193): time_from_first_action
    and time_to_now respectively.
    """

    hidden_size: int
    dtype: Optional[jnp.dtype] = None   # bf16 matmuls, f32 carry/gates
    unroll: int = 1                     # lax.scan unroll factor

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_last: jnp.ndarray,
                 t_now: jnp.ndarray, mask: jnp.ndarray):
        B, L, D = x.shape
        H = self.hidden_size
        dt = self.dtype

        w_tn = self.param("time_input_w1", tf1_glorot_uniform, (H,))
        b_tn = self.param("time_input_bias1", nn.initializers.zeros, (H,))
        w_tl = self.param("time_input_w2", tf1_glorot_uniform, (H,))
        b_tl = self.param("time_input_bias2", nn.initializers.zeros, (H,))
        Wk1 = self.param("time_kernel_w1", tf1_glorot_uniform, (D, H))
        T1 = self.param("time_kernel_t1", tf1_glorot_uniform, (H, H))
        tb1 = self.param("time_bias1", nn.initializers.zeros, (H,))
        Wk2 = self.param("time_kernel_w2", tf1_glorot_uniform, (D, H))
        T2 = self.param("time_kernel_t2", tf1_glorot_uniform, (H, H))
        tb2 = self.param("time_bias2", nn.initializers.zeros, (H,))
        Ot1 = self.param("o_kernel_t1", tf1_glorot_uniform, (H, H))
        Ot2 = self.param("o_kernel_t2", tf1_glorot_uniform, (H, H))
        W = self.param("kernel", tf1_glorot_uniform, (D + H, 4 * H))
        b = self.param("bias", nn.initializers.zeros, (4 * H,))

        # --- input-only terms, hoisted out of the recurrence ------------
        xc_ = _cast(x, dt)
        tn_in = _cast(jnp.tanh(t_now[..., None] * w_tn + b_tn), dt)  # [B,L,H]
        tl_in = _cast(jnp.tanh(t_last[..., None] * w_tl + b_tl), dt)
        tn_state = (jnp.einsum("bld,dh->blh", xc_, _cast(Wk1, dt))
                    + jnp.einsum("blh,hk->blk", tn_in, _cast(T1, dt))
                    + _cast(tb1, dt))
        tl_state = (jnp.einsum("bld,dh->blh", xc_, _cast(Wk2, dt))
                    + jnp.einsum("blh,hk->blk", tl_in, _cast(T2, dt))
                    + _cast(tb2, dt))
        o_time = (jnp.einsum("blh,hk->blk", tn_in, _cast(Ot1, dt))
                  + jnp.einsum("blh,hk->blk", tl_in, _cast(Ot2, dt)))
        xw = jnp.einsum("bld,dk->blk", xc_, _cast(W[:D], dt)) + _cast(b, dt)
        Wh = _cast(W[D:], dt)

        carry0 = (jnp.zeros((B, H), jnp.float32),
                  jnp.zeros((B, H), jnp.float32))

        def step(carry, inp):
            c, m = carry
            xw_t, tn_t, tl_t, ot_t = inp
            mat = _f32(xw_t + _cast(m, dt) @ Wh, dt)
            tn_t, tl_t, ot_t = (_f32(tn_t, dt), _f32(tl_t, dt),
                                _f32(ot_t, dt))
            i, j, f, o = jnp.split(mat, 4, axis=-1)
            o = o + ot_t
            c_new = (jax.nn.sigmoid(f + 1.0) * jax.nn.sigmoid(tl_t) * c
                     + jax.nn.sigmoid(i) * jax.nn.sigmoid(tn_t) * jnp.tanh(j))
            m_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (c_new, m_new), m_new

        (c_f, m_f), outs = _masked_scan(
            step, carry0,
            (_to_time_major(xw), _to_time_major(tn_state),
             _to_time_major(tl_state), _to_time_major(o_time)),
            _to_time_major(mask), unroll=self.unroll,
        )
        return _to_batch_major(outs), (c_f, m_f)


class Time4ALSTM(nn.Module):
    """Attention-blended Time4LSTM (rnn_cell_implement.py:301-555).

    Identical to Time4LSTM except a per-step attention score blends the
    new cell/output states: `c = a*c + (1-a)*c`, `m = a*m + (1-a)*m`
    (rnn_cell_implement.py:548-549) — algebraically the IDENTITY, kept
    literally for parity.  The cell is dead code in the reference (never
    instantiated by any model); provided for inventory completeness.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_last: jnp.ndarray,
                 t_now: jnp.ndarray, att_scores: jnp.ndarray,
                 mask: jnp.ndarray):
        outs, (c_f, m_f) = Time4LSTM(self.hidden_size, name="t4l")(
            x, t_last, t_now, mask)
        a = att_scores[..., None]
        outs = a * outs + (1.0 - a) * outs
        return outs, (c_f, m_f)


class VecAttGRU(nn.Module):
    """Attention-modulated GRU (DIEN; rnn_cell_implement.py:558-623).

    Grouped extension: `att_scores` may be [B, L] (one score stream) or
    [B, G, L] (G target-conditioned streams).  The shared inputs are
    projected ONCE; with grouped scores the recurrence carries [B, G, H] —
    G recurrences share one scan, one input projection, one weight load.
    """

    hidden_size: int
    dtype: Optional[jnp.dtype] = None   # bf16 matmuls, f32 carry/gates
    unroll: int = 1                     # lax.scan unroll factor

    @nn.compact
    def __call__(self, x: jnp.ndarray, att_scores: jnp.ndarray,
                 mask: jnp.ndarray,
                 init_state: Optional[jnp.ndarray] = None):
        B, L, D = x.shape
        H = self.hidden_size
        dt = self.dtype
        grouped = att_scores.ndim == 3
        G = att_scores.shape[1] if grouped else 1

        Wg = self.param("gate_kernel", tf1_glorot_uniform, (D + H, 2 * H))
        bg = self.param("gate_bias", nn.initializers.ones, (2 * H,))
        Wc = self.param("cand_kernel", tf1_glorot_uniform, (D + H, H))
        bc = self.param("cand_bias", nn.initializers.zeros, (H,))

        xg = jnp.einsum("bld,dk->blk", _cast(x, dt), _cast(Wg[:D], dt)) \
            + _cast(bg, dt)
        xc = jnp.einsum("bld,dk->blk", _cast(x, dt), _cast(Wc[:D], dt))
        Whg, Whc = _cast(Wg[D:], dt), _cast(Wc[D:], dt)

        att_g = att_scores if grouped else att_scores[:, None, :]  # [B,G,L]

        if init_state is None:
            h0 = jnp.zeros((B, G, H), jnp.float32)
        else:
            h0 = jnp.broadcast_to(init_state[:, None, :], (B, G, H))

        def step(h, inp):                       # h [B,G,H]
            xg_t, xc_t, att_t = inp             # [B,2H],[B,H],[B,G]
            gates = jax.nn.sigmoid(
                _f32(xg_t[:, None, :] + _cast(h, dt) @ Whg, dt))
            r, u = jnp.split(gates, 2, axis=-1)
            c = jnp.tanh(
                _f32(xc_t[:, None, :] + _cast(r * h, dt) @ Whc, dt) + bc)
            u = (1.0 - att_t[..., None]) * u
            h_new = u * h + (1.0 - u) * c
            return h_new, h_new

        def body(h, inp):
            xg_t, xc_t, att_t, m_t = inp
            h_new, _ = step(h, (xg_t, xc_t, att_t))
            m = m_t[:, None, None]
            h_next = m * h_new + (1.0 - m) * h
            return h_next, m * h_new

        final, outs = jax.lax.scan(
            body, h0,
            (_to_time_major(xg), _to_time_major(xc),
             jnp.moveaxis(att_g, 2, 0), _to_time_major(mask)),
            unroll=self.unroll,
        )
        outs = jnp.moveaxis(outs, 0, 2)          # [B,G,L,H]
        if not grouped:
            return outs[:, 0], final[:, 0]
        return outs, final
