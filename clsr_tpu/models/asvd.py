"""A2SVD (reference asvd.py:27-45): global soft-attention pooled history
(no mask — reference quirk preserved in SoftAttention), concat target."""

from __future__ import annotations

import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import EmbedContext, SequentialModelBase
from clsr_tpu.ops.attention import SoftAttention
from clsr_tpu.ops.initializers import get_initializer


class A2SVDModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        B, G = batch.items.shape
        hist = ctx.hist_input
        att_outputs = SoftAttention(cfg.attention_size, kernel_init=init,
                                    name="attention_layer")(hist)
        asvd_output = att_outputs.sum(axis=1)                     # [B, D]
        out_g = jnp.broadcast_to(asvd_output[:, None, :],
                                 (B, G, asvd_output.shape[-1]))
        return jnp.concatenate([out_g, ctx.target_emb], -1), {}
