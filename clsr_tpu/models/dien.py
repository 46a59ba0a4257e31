"""DIEN (reference dien.py:21-64): interest extraction GRU, target-query
attention weights, attention-modulated VecAttGRU second pass.

The second GRU's gates depend on the target (via the attention weights), so
with G candidate targets it carries a [B, G, H] state — one shared scan and
one input projection for all G (see ops/rnn.py VecAttGRU), where the
reference re-runs both full RNNs for each of the (1+num_ngs) row copies."""

from __future__ import annotations

import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import (bn_stats_mask_active, EmbedContext, SequentialModelBase,
                                  compute_dtype)
from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.initializers import get_initializer
from clsr_tpu.ops.rnn import GRU, VecAttGRU


class DIENModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        B, G = batch.items.shape
        hist = ctx.hist_input
        mask = batch.mask

        hist_sum = (hist * mask[..., None]).sum(axis=1)           # [B, D]

        rnn_outputs, _ = GRU(cfg.hidden_size, name="gru1")(hist, mask)

        _, alphas = TargetAttention(
            cfg.att_fcn_layer_sizes, cfg.activation, enable_bn=cfg.enable_bn,
            kernel_init=init, dtype=compute_dtype(cfg),
            bn_stats_mask=bn_stats_mask_active(cfg), name="attention_fcn",
        )(ctx.target_emb, rnn_outputs, mask, train=train,
          return_weights=True)                                    # [B, G, L]

        _, final_state = VecAttGRU(cfg.hidden_size, name="gru2")(
            rnn_outputs, alphas, mask)                            # [B, G, H]

        sum_g = jnp.broadcast_to(hist_sum[:, None, :],
                                 (B, G, hist_sum.shape[-1]))
        model_output = jnp.concatenate(
            [ctx.target_emb, final_state, sum_g, ctx.target_emb * sum_g],
            axis=-1)
        return model_output, {}
