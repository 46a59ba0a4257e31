"""Long-context target attention (L >= 1000).

The reference caps history length by TRUNCATION (50/250,
sequential_iterator.py:373-377); SURVEY.md section 5 names full-history
scaling via blockwise attention over the sequence axis as the TPU-native
extension.  CLSR's attention is single-query-per-(row, target) — there
is no LxL matrix — so the memory hog at large L is the scorer's
[B, L, G, H] hidden activations (800MB at B=512, L=1000, G=5, H=80).

`LongTargetAttention` computes the EXACT same math as
ops/attention.py:TargetAttention (BN off) in KEY BLOCKS with a streaming
(online) softmax: a lax.scan over L/block_size chunks carries the
running max, normalizer and weighted-sum accumulator, so live memory is
O(B * block_size * G * H) regardless of L; each block is rematerialized
in the backward pass (jax.checkpoint).

`seq_sharded_attention` additionally shards the key/history axis over a
mesh axis (sequence parallelism): every shard reduces its local blocks,
then the per-shard (max, normalizer, accumulator) triples are merged
with log-sum-exp algebra via collectives.  Because the query is
key-independent, no ring pass is needed — one lse-merge replaces ring
attention's N-step rotation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clsr_tpu.ops.attention import MASK_PADDING_VALUE
from clsr_tpu.ops.initializers import tf1_glorot_uniform


def _scorer_apply(params, keys_blk, query, dtype):
    """Split-first-layer scorer on one key block.

    keys_blk [B, C, Dk], query [B, G, Dq] -> logits [B, C, G].
    Same decomposition as ops/mlp.py:SplitFirstDense (relu MLP, no BN).
    """
    ct = dtype or keys_blk.dtype
    W = params["attention_mat"].astype(ct)
    D = W.shape[1]
    k = jnp.einsum("bcd,dq->bcq", keys_blk.astype(ct), W)   # [B, C, Dq]
    q = query.astype(ct)
    x = None
    for i, (kern, bias) in enumerate(params["layers"]):
        kern = kern.astype(ct)
        bias = bias.astype(ct)
        if i == 0:
            wk, wq, wd, wm = (kern[:D], kern[D:2 * D], kern[2 * D:3 * D],
                              kern[3 * D:])
            term_k = jnp.einsum("bcd,dh->bch", k, wk + wd)
            term_q = jnp.einsum("bgd,dh->bgh", q, wq - wd)
            B, G = q.shape[:2]
            C = k.shape[1]
            H = kern.shape[1]
            qw = jnp.einsum("bgd,dh->bdgh", q, wm).reshape(B, D, G * H)
            term_m = jax.lax.dot_general(
                k, qw, (((2,), (1,)), ((0,), (0,)))).reshape(B, C, G, H)
            x = (term_m + term_k[:, :, None, :] + term_q[:, None, :, :]
                 + bias)
        else:
            x = jnp.einsum("bcgh,hk->bcgk", x, kern) + bias
        if i < len(params["layers"]) - 1:
            x = jax.nn.relu(x)
    return x[..., 0].astype(jnp.float32)                     # [B, C, G]


def _block_update(carry, logits, keys_blk, mask_blk):
    """Online-softmax accumulate one block.

    carry = (m [B,G], s [B,G], acc [B,G,Dk]); logits [B,C,G]."""
    m, s, acc = carry
    logits = jnp.where(mask_blk[:, :, None] > 0, logits,
                       MASK_PADDING_VALUE)
    blk_max = logits.max(axis=1)                             # [B, G]
    m_new = jnp.maximum(m, blk_max)
    scale = jnp.exp(m - m_new)
    p = jnp.exp(logits - m_new[:, None, :])                  # [B, C, G]
    s_new = s * scale + p.sum(axis=1)
    acc_new = (acc * scale[..., None]
               + jnp.einsum("bcg,bcd->bgd", p, keys_blk))
    return m_new, s_new, acc_new


class LongTargetAttention(nn.Module):
    """Blockwise TargetAttention (BN-free scorer) for long histories.

    Same math as TargetAttention(enable_bn=False); parameters are owned
    directly (attention_mat, w_nn_layer{i}_{kernel,bias},
    w_nn_output_{kernel,bias}).
    """

    layer_sizes: Sequence[int]
    block_size: int = 256
    kernel_init: nn.initializers.Initializer = tf1_glorot_uniform
    dtype: Optional[jnp.dtype] = None

    def _params(self, Dk: int, Dq: int):
        W = self.param("attention_mat", self.kernel_init, (Dk, Dq))
        layers = []
        in_dim = 4 * Dq
        for i, size in enumerate(self.layer_sizes):
            layers.append((
                self.param(f"w_nn_layer{i}_kernel", self.kernel_init,
                           (in_dim, size)),
                self.param(f"w_nn_layer{i}_bias", nn.initializers.zeros,
                           (size,)),
            ))
            in_dim = size
        layers.append((
            self.param("w_nn_output_kernel", self.kernel_init, (in_dim, 1)),
            self.param("w_nn_output_bias", nn.initializers.zeros, (1,)),
        ))
        return {"attention_mat": W, "layers": layers}

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False,
                 axis_name: Optional[str] = None):
        """query [B, Dq] or [B, G, Dq]; keys [B, L, Dk]; mask [B, L].

        With `axis_name`, the L axis is a SHARD of a sequence-sharded
        global history (inside shard_map): per-shard partials are merged
        across `axis_name` with lse algebra.
        """
        squeeze = query.ndim == 2
        if squeeze:
            query = query[:, None, :]
        B, G, Dq = query.shape
        L, Dk = keys.shape[1], keys.shape[2]
        params = self._params(Dk, Dq)

        C = min(self.block_size, L)
        pad = (-L) % C
        if pad:
            keys = jnp.pad(keys, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
        nb = keys.shape[1] // C
        keys_b = keys.reshape(B, nb, C, Dk).transpose(1, 0, 2, 3)
        mask_b = mask.reshape(B, nb, C).transpose(1, 0, 2)

        def body(carry, xs):
            kb, mb = xs
            logits = _scorer_apply(params, kb, query, self.dtype)
            return _block_update(carry, logits, kb, mb), None

        body = jax.checkpoint(body)
        carry0 = (jnp.full((B, G), MASK_PADDING_VALUE, jnp.float32),
                  jnp.zeros((B, G), jnp.float32),
                  jnp.zeros((B, G, Dk), jnp.float32))
        (m, s, acc), _ = jax.lax.scan(body, carry0, (keys_b, mask_b))

        if axis_name is not None:
            # merge per-shard partials: global lse combine
            m_all = jax.lax.all_gather(m, axis_name)          # [P, B, G]
            s_all = jax.lax.all_gather(s, axis_name)
            acc_all = jax.lax.all_gather(acc, axis_name)
            m_g = m_all.max(axis=0)
            scale = jnp.exp(m_all - m_g[None])
            s = (s_all * scale).sum(axis=0)
            acc = (acc_all * scale[..., None]).sum(axis=0)

        att_fea = acc / jnp.maximum(s, 1e-30)[..., None]
        return att_fea[:, 0] if squeeze else att_fea
