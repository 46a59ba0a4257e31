"""NextItNet (reference nextitnet.py:21-225): stacked dilated causal conv
residual blocks over the history.

Encoder parity details:
  * residual block = LN -> relu -> 1x1 conv (C/2) -> LN -> relu -> causal
    dilated conv (kernel k, dilation d, C/2) -> LN -> relu -> 1x1 conv (C)
    -> + input (nextitnet.py:104-156).
  * LayerNorm epsilon 1e-8 over the feature axis (nextitnet.py:203-225).
  * conv weights truncated_normal(0.02), zero bias (nextitnet.py:168-176).
  * the reference's NextItNetIterator RIGHT-aligns histories (pads in
    front, nextitnet_iterator.py:146-167) and reads the LAST time step; the
    framework loader left-aligns, so the model right-aligns internally.

Training protocol: per-position targets (2-D labels via
NextItNetIterator + the softmax reshape in base_model.py:218-228) ARE
implemented and ON by default — negative_sampling.py:expand_nextitnet
builds the position-expanded [B, G, L] targets on device and
losses.py:data_loss_fn applies the reference's (row, position)-grouped
softmax; gate with cfg.nextitnet_per_position (config.py).  With the
flag off, training falls back to the framework's standard last-position
grouped protocol.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import EmbedContext, SequentialModelBase


def right_align(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Shift each row's valid prefix to the end: [v1..vn 0..0] -> [0..0 v1..vn]."""
    B, L = mask.shape
    lengths = mask.sum(axis=1).astype(jnp.int32)        # [B]
    t = jnp.arange(L)[None, :]
    src = t - (L - lengths[:, None])                    # index into old row
    safe = jnp.clip(src, 0, L - 1)
    gathered = jnp.take_along_axis(
        x, safe.reshape(B, L, *([1] * (x.ndim - 2))).astype(jnp.int32),
        axis=1) if x.ndim > 2 else jnp.take_along_axis(x, safe, axis=1)
    keep = (src >= 0)
    keep = keep.reshape(B, L, *([1] * (x.ndim - 2)))
    return jnp.where(keep, gathered, 0)


class _LayerNorm(nn.Module):
    """tf.contrib-style LN, epsilon inside the sqrt (nextitnet.py:203-225)."""

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + 1e-8) + beta


class NextItNetModel(SequentialModelBase):

    def _conv1d(self, x, out_ch, kernel_size=1, dilation=1, causal=False,
                name="conv"):
        conv = nn.Conv(
            out_ch, kernel_size=(kernel_size,),
            kernel_dilation=(dilation,),
            padding=[((kernel_size - 1) * dilation, 0)] if causal else "SAME",
            kernel_init=nn.initializers.truncated_normal(stddev=0.02),
            bias_init=nn.initializers.zeros, name=name)
        return conv(x)

    def _residual_block(self, x, dilation, layer_id, channels, kernel_size):
        name = f"resblock_{layer_id}_{dilation}"
        h = _LayerNorm(name=f"{name}_ln1")(x)
        h = nn.relu(h)
        h = self._conv1d(h, channels // 2, name=f"{name}_conv1")
        h = _LayerNorm(name=f"{name}_ln2")(h)
        h = nn.relu(h)
        h = self._conv1d(h, channels // 2, kernel_size, dilation,
                         causal=True, name=f"{name}_dilated")
        h = _LayerNorm(name=f"{name}_ln3")(h)
        h = nn.relu(h)
        h = self._conv1d(h, channels, name=f"{name}_conv2")
        return x + h

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        hist = right_align(ctx.hist_input, batch.mask)
        channels = hist.shape[-1]
        for layer_id, dilation in enumerate(cfg.dilations):
            hist = self._residual_block(hist, dilation, layer_id, channels,
                                        cfg.kernel_size)
        if batch.items.ndim == 3:
            # per-position training (nextitnet.py:77-91 _training_output):
            # every time step is an instance, targets [B, G, L]
            B, G, L = batch.items.shape
            dilate_g = jnp.broadcast_to(hist[:, None, :, :],
                                        (B, G, L, channels))
            return jnp.concatenate([dilate_g, ctx.target_emb], -1), {}
        B, G = batch.items.shape
        last = hist[:, -1, :]                              # last real event
        last_g = jnp.broadcast_to(last[:, None, :], (B, G, channels))
        return jnp.concatenate([last_g, ctx.target_emb], -1), {}
