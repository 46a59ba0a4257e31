"""SLI-Rec (reference sli_rec.py:25-147) — CLSR's closest ancestor.

Long-term: global soft attention (`_attention`) over the history.
Short-term: Time4LSTM over the ITEM embedding only (+2 time features,
sli_rec.py:44-66) -> target-query attention.  Learned sigmoid alpha fuses
the two, concat with target into the shared head (sli_rec.py:78-102)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import (bn_stats_mask_active, EmbedContext, SequentialModelBase,
                                  compute_dtype)
from clsr_tpu.ops.attention import SoftAttention, TargetAttention
from clsr_tpu.ops.initializers import get_initializer
from clsr_tpu.ops.mlp import FcnNet
from clsr_tpu.ops.rnn import Time4LSTM


class SLIRecModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        B, G = batch.items.shape
        hist = ctx.hist_input
        mask = batch.mask

        att_outputs1 = SoftAttention(cfg.attention_size, kernel_init=init,
                                     name="long_term_asvd")(hist)
        att_fea1 = att_outputs1.sum(axis=1)                       # [B, D]

        # Time4LSTM over the item embedding only (sli_rec.py:44-58)
        rnn_outputs, _ = Time4LSTM(cfg.hidden_size, name="time4lstm")(
            ctx.item_hist_emb, t_last=batch.time_from_first,
            t_now=batch.time_to_now, mask=mask)

        att_fea2 = TargetAttention(
            cfg.att_fcn_layer_sizes, cfg.activation, enable_bn=cfg.enable_bn,
            kernel_init=init, dtype=compute_dtype(cfg),
            bn_stats_mask=bn_stats_mask_active(cfg), name="attention_fcn",
        )(ctx.target_emb, rnn_outputs, mask, train=train)         # [B, G, H]

        fea1_g = jnp.broadcast_to(att_fea1[:, None, :],
                                  (B, G, att_fea1.shape[-1]))
        if not cfg.manual_alpha:
            last_time = jnp.broadcast_to(
                batch.time_to_now[:, -1][:, None, None], (B, G, 1))
            concat_all = jnp.concatenate(
                [ctx.target_emb, fea1_g, att_fea2, last_time], axis=-1)
            alpha_logit = FcnNet(
                cfg.att_fcn_layer_sizes, cfg.activation,
                enable_bn=cfg.enable_bn, out_dim=1, kernel_init=init,
                dtype=compute_dtype(cfg),
                name="fcn_alpha")(concat_all, train=train)
            alpha = jax.nn.sigmoid(alpha_logit)
            user_embed = fea1_g * alpha + att_fea2 * (1.0 - alpha)
            alpha_out = alpha[..., 0]
        else:
            a = cfg.manual_alpha_value
            user_embed = fea1_g * a + att_fea2 * (1.0 - a)
            alpha_out = jnp.full((B, G), a, hist.dtype)

        model_output = jnp.concatenate([user_embed, ctx.target_emb], -1)
        return model_output, {"alpha": alpha_out}
