"""Golden-value tests for recurrent cells and attention.

Each cell is checked against a literal per-step numpy transcription of the
TF1 math (rnn_cell_implement.py), and masking against dynamic_rnn semantics
(outputs zero past length, state carried through).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.rnn import GRU, LSTM, Time4LSTM, VecAttGRU


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _mask(B, L, lengths):
    m = np.zeros((B, L), np.float32)
    for i, n in enumerate(lengths):
        m[i, :n] = 1
    return m


class TestGRU:
    B, L, D, H = 4, 7, 5, 6

    def _run(self, lengths):
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.L, self.D).astype(np.float32)
        m = _mask(self.B, self.L, lengths)
        mod = GRU(self.H)
        variables = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(m))
        outs, final = mod.apply(variables, jnp.array(x), jnp.array(m))
        return x, m, variables["params"], np.array(outs), np.array(final)

    def _manual(self, x, m, p):
        Wg, bg = np.array(p["gate_kernel"]), np.array(p["gate_bias"])
        Wc, bc = np.array(p["cand_kernel"]), np.array(p["cand_bias"])
        B, L, D = x.shape
        H = self.H
        h = np.zeros((B, H), np.float32)
        outs = np.zeros((B, L, H), np.float32)
        for t in range(L):
            xt = x[:, t]
            gates = sigmoid(np.concatenate([xt, h], -1) @ Wg + bg)
            r, u = gates[:, :H], gates[:, H:]
            c = np.tanh(np.concatenate([xt, r * h], -1) @ Wc + bc)
            h_new = u * h + (1 - u) * c
            mt = m[:, t:t + 1]
            h = mt * h_new + (1 - mt) * h
            outs[:, t] = mt * h_new
        return outs, h

    def test_matches_manual(self):
        x, m, p, outs, final = self._run([7, 5, 3, 1])
        w_outs, w_final = self._manual(x, m, p)
        np.testing.assert_allclose(outs, w_outs, atol=1e-5)
        np.testing.assert_allclose(final, w_final, atol=1e-5)

    def test_mask_semantics(self):
        x, m, p, outs, final = self._run([3, 3, 3, 3])
        assert np.all(outs[:, 3:] == 0)         # zero past length
        np.testing.assert_allclose(final, outs[:, 2], atol=1e-6)  # state at t=len-1

    def test_init_state_used(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, self.D).astype(np.float32)
        m = _mask(2, 3, [3, 3])
        h0 = rng.randn(2, self.H).astype(np.float32)
        mod = GRU(self.H)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(m))
        _, f0 = mod.apply(v, jnp.array(x), jnp.array(m))
        _, f1 = mod.apply(v, jnp.array(x), jnp.array(m), jnp.array(h0))
        assert not np.allclose(np.array(f0), np.array(f1))


class TestLSTM:
    B, L, D, H = 3, 6, 4, 5

    def test_matches_manual(self):
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.L, self.D).astype(np.float32)
        lengths = [6, 4, 2]
        m = _mask(self.B, self.L, lengths)
        mod = LSTM(self.H)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(m))
        outs, (cf, mf) = mod.apply(v, jnp.array(x), jnp.array(m))
        W = np.array(v["params"]["kernel"])
        b = np.array(v["params"]["bias"])
        H = self.H
        c = np.zeros((self.B, H), np.float32)
        h = np.zeros((self.B, H), np.float32)
        w_outs = np.zeros((self.B, self.L, H), np.float32)
        for t in range(self.L):
            mat = np.concatenate([x[:, t], h], -1) @ W + b
            i, j, f, o = np.split(mat, 4, -1)
            c_new = sigmoid(f + 1.0) * c + sigmoid(i) * np.tanh(j)
            h_new = sigmoid(o) * np.tanh(c_new)
            mt = m[:, t:t + 1]
            c = mt * c_new + (1 - mt) * c
            h = mt * h_new + (1 - mt) * h
            w_outs[:, t] = mt * h_new
        np.testing.assert_allclose(np.array(outs), w_outs, atol=1e-5)
        np.testing.assert_allclose(np.array(mf), h, atol=1e-5)
        np.testing.assert_allclose(np.array(cf), c, atol=1e-5)


class TestTime4LSTM:
    B, L, D, H = 3, 5, 4, 6

    def test_matches_manual(self):
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.L, self.D).astype(np.float32)
        t_last = rng.rand(self.B, self.L).astype(np.float32)
        t_now = rng.rand(self.B, self.L).astype(np.float32)
        m = _mask(self.B, self.L, [5, 3, 1])
        mod = Time4LSTM(self.H)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(t_last),
                     jnp.array(t_now), jnp.array(m))
        outs, _ = mod.apply(v, jnp.array(x), jnp.array(t_last),
                            jnp.array(t_now), jnp.array(m))
        p = {k: np.array(val) for k, val in v["params"].items()}
        H = self.H
        c = np.zeros((self.B, H), np.float32)
        hm = np.zeros((self.B, H), np.float32)
        w_outs = np.zeros((self.B, self.L, H), np.float32)
        for t in range(self.L):
            # literal transcription of rnn_cell_implement.py:200-272
            tn_in = np.tanh(t_now[:, t:t + 1] * p["time_input_w1"]
                            + p["time_input_bias1"])
            tl_in = np.tanh(t_last[:, t:t + 1] * p["time_input_w2"]
                            + p["time_input_bias2"])
            tn_state = (x[:, t] @ p["time_kernel_w1"]
                        + tn_in @ p["time_kernel_t1"] + p["time_bias1"])
            tl_state = (x[:, t] @ p["time_kernel_w2"]
                        + tl_in @ p["time_kernel_t2"] + p["time_bias2"])
            mat = np.concatenate([x[:, t], hm], -1) @ p["kernel"] + p["bias"]
            i, j, f, o = np.split(mat, 4, -1)
            o = o + tn_in @ p["o_kernel_t1"] + tl_in @ p["o_kernel_t2"]
            c_new = (sigmoid(f + 1.0) * sigmoid(tl_state) * c
                     + sigmoid(i) * sigmoid(tn_state) * np.tanh(j))
            m_new = sigmoid(o) * np.tanh(c_new)
            mt = m[:, t:t + 1]
            c = mt * c_new + (1 - mt) * c
            hm = mt * m_new + (1 - mt) * hm
            w_outs[:, t] = mt * m_new
        np.testing.assert_allclose(np.array(outs), w_outs, atol=1e-5)


class TestVecAttGRU:
    B, L, D, H = 3, 5, 4, 4

    def test_matches_manual(self):
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.L, self.D).astype(np.float32)
        att = rng.rand(self.B, self.L).astype(np.float32)
        m = _mask(self.B, self.L, [5, 4, 2])
        mod = VecAttGRU(self.H)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(att),
                     jnp.array(m))
        outs, final = mod.apply(v, jnp.array(x), jnp.array(att), jnp.array(m))
        p = {k: np.array(val) for k, val in v["params"].items()}
        H = self.H
        h = np.zeros((self.B, H), np.float32)
        for t in range(self.L):
            xt = x[:, t]
            gates = sigmoid(np.concatenate([xt, h], -1) @ p["gate_kernel"]
                            + p["gate_bias"])
            r, u = gates[:, :H], gates[:, H:]
            c = np.tanh(np.concatenate([xt, r * h], -1) @ p["cand_kernel"]
                        + p["cand_bias"])
            u = (1.0 - att[:, t:t + 1]) * u
            h_new = u * h + (1 - u) * c
            mt = m[:, t:t + 1]
            h = mt * h_new + (1 - mt) * h
        np.testing.assert_allclose(np.array(final), h, atol=1e-5)


class TestTargetAttention:
    def test_grouped_equals_per_target(self):
        """One grouped pass over G targets == G separate single-target passes."""
        rng = np.random.RandomState(0)
        B, G, L, Dk, Dq = 3, 4, 6, 5, 7
        keys = rng.randn(B, L, Dk).astype(np.float32)
        query = rng.randn(B, G, Dq).astype(np.float32)
        mask = _mask(B, L, [6, 3, 1])
        mod = TargetAttention(layer_sizes=(8,), activations=("relu",))
        v = mod.init(jax.random.PRNGKey(0), jnp.array(query), jnp.array(keys),
                     jnp.array(mask))
        grouped = np.array(mod.apply(v, jnp.array(query), jnp.array(keys),
                                     jnp.array(mask)))
        for g in range(G):
            single = np.array(mod.apply(v, jnp.array(query[:, g]),
                                        jnp.array(keys), jnp.array(mask)))
            np.testing.assert_allclose(grouped[:, g], single, atol=1e-5)

    def test_mask_zeroes_padding_weight(self):
        rng = np.random.RandomState(0)
        B, L, Dk, Dq = 2, 5, 4, 4
        keys = rng.randn(B, L, Dk).astype(np.float32)
        query = rng.randn(B, Dq).astype(np.float32)
        mask = _mask(B, L, [2, 5])
        mod = TargetAttention(layer_sizes=(8,), activations=("relu",))
        v = mod.init(jax.random.PRNGKey(0), jnp.array(query), jnp.array(keys),
                     jnp.array(mask))
        _, w = mod.apply(v, jnp.array(query), jnp.array(keys),
                         jnp.array(mask), return_weights=True)
        w = np.array(w)
        assert np.all(w[0, 2:] < 1e-8)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)

    def test_padding_values_do_not_leak(self):
        """Changing key values at padded positions must not change output."""
        rng = np.random.RandomState(0)
        B, L, Dk, Dq = 2, 5, 4, 4
        keys = rng.randn(B, L, Dk).astype(np.float32)
        query = rng.randn(B, Dq).astype(np.float32)
        mask = _mask(B, L, [3, 4])
        mod = TargetAttention(layer_sizes=(8,), activations=("relu",))
        v = mod.init(jax.random.PRNGKey(0), jnp.array(query), jnp.array(keys),
                     jnp.array(mask))
        out1 = np.array(mod.apply(v, jnp.array(query), jnp.array(keys),
                                  jnp.array(mask)))
        keys2 = keys.copy()
        keys2[0, 3:] = 99.0
        keys2[1, 4:] = -99.0
        out2 = np.array(mod.apply(v, jnp.array(query), jnp.array(keys2),
                                  jnp.array(mask)))
        np.testing.assert_allclose(out1, out2, atol=1e-4)
