"""DIN (reference din.py:16-34): target-query attention over the history
plus the masked history SUM (not mean), concat with target."""

from __future__ import annotations

import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import (bn_stats_mask_active, EmbedContext, SequentialModelBase,
                                  compute_dtype)
from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.initializers import get_initializer


class DINModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        B, G = batch.items.shape
        hist = ctx.hist_input
        mask = batch.mask

        hist_sum = (hist * mask[..., None]).sum(axis=1)           # [B, D]
        att_fea = TargetAttention(
            cfg.att_fcn_layer_sizes, cfg.activation, enable_bn=cfg.enable_bn,
            kernel_init=init, dtype=compute_dtype(cfg),
            bn_stats_mask=bn_stats_mask_active(cfg), name="attention_fcn",
        )(ctx.target_emb, hist, mask, train=train)                # [B, G, D]

        sum_g = jnp.broadcast_to(hist_sum[:, None, :],
                                 (B, G, hist_sum.shape[-1]))
        model_output = jnp.concatenate(
            [ctx.target_emb, sum_g, att_fea], axis=-1)
        return model_output, {}
