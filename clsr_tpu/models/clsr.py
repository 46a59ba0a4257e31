"""CLSR: disentangled long/short-term interest model.

TPU-native reimplementation of the reference CLSRModel (clsr.py:20-455):

  * five embedding tables — base item/cate (+ unused base user) plus
    per-user LONG and SHORT interest tables (clsr.py:84-101).
  * long-term encoder: target-independent attention, query =
    user_long_embedding (clsr.py:152-155); proxy = masked history mean
    (clsr.py:157).
  * short-term encoder: interest-evolution GRU with initial state =
    user_short_embedding (clsr.py:160-171); recurrent encoder over the
    history (time4lstm / gru / lstm, clsr.py:179-216); target-conditioned
    attention with query concat(short_term_intention, target)
    (clsr.py:219-221); proxy = mean of the last contrastive_recent_k valid
    positions via reverse-cumsum mask (clsr.py:173-177).
  * fusion: auxiliary "causal2" GRU final state + target + both interest
    vectors + the LAST COLUMN of time_to_now (clsr.py:239-248 — note the
    reference indexes the padded column L-1, which is 0 unless the history
    fills max_seq_length; preserved verbatim) -> MLP -> sigmoid alpha ->
    user_embed = alpha*long + (1-alpha)*short (clsr.py:261-274).
  * output: concat(user_embed, target) -> shared logit head (clsr.py:275).

Grouped-target redesign: everything target-independent (both RNN scans, the
long attention, the proxies, the causal2 scan) runs ONCE per row; only the
short-attention scorer and the alpha/logit MLPs fan out over the G candidate
targets.  The reference instead replicates each row 1+num_ngs times and
re-runs all three RNNs per copy (sequential_iterator.py:344-394) — identical
math, (1+num_ngs)x the FLOPs.

Aux outputs feed the contrastive/discrepancy/lazy-L2 losses
(clsr.py:22-82); see clsr_tpu/training/losses.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from clsr_tpu.models.base import (EmbedContext, SequentialModelBase,
                                  compute_dtype, unique_rows_stats)
from clsr_tpu.data.batch import Batch
from clsr_tpu.ops.attention import TargetAttention
from clsr_tpu.ops.fused_clsr import FusedCLSREncoder
from clsr_tpu.ops.initializers import get_initializer
from clsr_tpu.ops.mlp import FcnNet
from clsr_tpu.ops.rnn import GRU, LSTM, Time4LSTM


class CLSRModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool
                  ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        B, G = batch.items.shape

        from clsr_tpu.models.base import embedding_init, lookup_rows
        e_init = embedding_init(cfg, init)
        user_long_table = self.param(
            "user_long_embedding", e_init,
            (self.n_users, cfg.user_embedding_dim))
        user_short_table = self.param(
            "user_short_embedding", e_init,
            (self.n_users, cfg.user_embedding_dim))

        from clsr_tpu.models.base import lookup_cast
        from clsr_tpu.training.compact_rows import active_compact
        cc = active_compact() or {}
        cr_l = cc.get("user_long_embedding")
        cr_s = cc.get("user_short_embedding")
        if cr_l is not None and cr_s is not None:
            # compact row engine (single-device or mesh): both tables
            # share one plan (same user ids) so the L2/discrepancy
            # stats come straight from the already-gathered rows
            # (clsr.py:73-82,118-127 semantics)
            user_long = self._dropout(
                lookup_cast(cfg, cr_l.site("rows")), train)
            user_short = self._dropout(
                lookup_cast(cfg, cr_s.site("rows")), train)
            sumsq_l, sumsq_s, sumsq_diff, n_elems = cr_l.pair_stats(cr_s)
        else:
            user_long = self._dropout(
                lookup_rows(self, cfg, user_long_table, batch.users,
                            "user_long_embedding"), train)
            user_short = self._dropout(
                lookup_rows(self, cfg, user_short_table, batch.users,
                            "user_short_embedding"), train)

            # involved-user L2 + discrepancy (clsr.py:73-82,118-127)
            sumsq_l, sumsq_s, sumsq_diff, n_elems = unique_rows_stats(
                user_long_table, user_short_table, batch.users)

        hist = ctx.hist_input                       # [B, L, 40]
        mask = batch.mask
        seq_len = mask.sum(-1)                      # [B]

        # ---- long term (clsr.py:152-157) --------------------------------
        if cfg.attention_block_size > 0:
            from clsr_tpu.ops.long_context import LongTargetAttention
            att_cls = lambda name: LongTargetAttention(
                cfg.att_fcn_layer_sizes,
                block_size=cfg.attention_block_size, kernel_init=init,
                dtype=compute_dtype(cfg), name=name)
        else:
            from clsr_tpu.models.base import bn_stats_mask_active
            att_cls = lambda name: TargetAttention(
                cfg.att_fcn_layer_sizes, cfg.activation,
                enable_bn=cfg.enable_bn, kernel_init=init,
                dtype=compute_dtype(cfg),
                bn_stats_mask=bn_stats_mask_active(cfg), name=name)
        att_fea_long = att_cls("long_term_att")(
            user_long, hist, mask, train=train)     # [B, 40]
        hist_mean = ((hist * mask[..., None]).sum(1)
                     / jnp.maximum(mask.sum(1, keepdims=True), 1.0))

        # recent-k proxy via reverse cumsum (clsr.py:173-177)
        position = jnp.cumsum(mask[:, ::-1], axis=1)[:, ::-1]
        recent = ((position >= 1)
                  & (position <= cfg.contrastive_recent_k)).astype(hist.dtype)
        hist_recent = ((hist * recent[..., None]).sum(1)
                       / jnp.maximum(recent.sum(1, keepdims=True), 1.0))

        # ---- short term (clsr.py:159-222) -------------------------------
        fused = cfg.use_fused_encoders and cfg.sequential_model == "time4lstm"
        causal2_state = None
        cdt = compute_dtype(cfg)   # bf16 recurrence matmuls when set
        if fused:
            # all three recurrences in ONE scan (ops/fused_clsr.py)
            h1, rnn_outputs, causal2_state = FusedCLSREncoder(
                cfg.user_embedding_dim, cfg.hidden_size,
                interest_evolve=cfg.interest_evolve,
                predict_long_short=cfg.predict_long_short,
                use_pallas=cfg.use_pallas_scan, dtype=cdt,
                unroll=cfg.scan_unroll,
                concat_scan_inputs=cfg.scan_concat_inputs,
                remat_body=cfg.scan_remat_body,
                custom_vjp_scan=cfg.scan_custom_vjp,
                name="fused_encoders",
            )(hist, batch.time_from_first, batch.time_to_now, mask,
              user_short)
            short_term_intention = h1 if cfg.interest_evolve else user_short
        else:
            if cfg.interest_evolve:
                _, short_term_intention = GRU(
                    cfg.user_embedding_dim, dtype=cdt,
                    unroll=cfg.scan_unroll, name="short_term_intention",
                )(hist, mask, init_state=user_short)
            else:
                short_term_intention = user_short   # [B, 40]
            if cfg.sequential_model == "time4lstm":
                rnn_outputs, _ = Time4LSTM(cfg.hidden_size, dtype=cdt,
                                           unroll=cfg.scan_unroll,
                                           name="time4lstm")(
                    hist, t_last=batch.time_from_first,
                    t_now=batch.time_to_now, mask=mask)
            elif cfg.sequential_model == "gru":
                rnn_outputs, _ = GRU(cfg.hidden_size, dtype=cdt,
                                     unroll=cfg.scan_unroll,
                                     name="simple_gru")(
                    hist, mask)
            elif cfg.sequential_model == "lstm":
                rnn_outputs, _ = LSTM(cfg.hidden_size, dtype=cdt,
                                      unroll=cfg.scan_unroll,
                                      name="simple_lstm")(
                    hist, mask)
            else:
                raise ValueError(cfg.sequential_model)

        sti_g = jnp.broadcast_to(
            short_term_intention[:, None, :],
            (B, G, short_term_intention.shape[-1]))
        short_query = jnp.concatenate([sti_g, ctx.target_emb], -1)  # [B,G,80]
        att_fea_short = att_cls("short_term_att")(
            short_query, rnn_outputs, mask, train=train)    # [B, G, 40]

        # ---- fusion (clsr.py:225-274) -----------------------------------
        long_g = jnp.broadcast_to(att_fea_long[:, None, :],
                                  (B, G, att_fea_long.shape[-1]))
        if not cfg.manual_alpha:
            parts = []
            if cfg.predict_long_short:
                if causal2_state is None:
                    _, causal2_state = GRU(cfg.hidden_size, dtype=cdt,
                                           unroll=cfg.scan_unroll,
                                           name="causal2")(hist, mask)
                parts.append(jnp.broadcast_to(
                    causal2_state[:, None, :], (B, G, causal2_state.shape[-1])))
            last_time = jnp.broadcast_to(
                batch.time_to_now[:, -1][:, None, None], (B, G, 1))
            parts += [ctx.target_emb, long_g, att_fea_short, last_time]
            concat_all = jnp.concatenate(parts, axis=-1)
            alpha_logit = FcnNet(
                cfg.att_fcn_layer_sizes, cfg.activation,
                enable_bn=cfg.enable_bn, out_dim=1, kernel_init=init,
                dtype=compute_dtype(cfg),
                name="fcn_alpha",
            )(concat_all, train=train)
            alpha = jax.nn.sigmoid(alpha_logit)     # [B, G, 1]
            user_embed = long_g * alpha + att_fea_short * (1.0 - alpha)
            alpha_out = alpha[..., 0]
        else:
            a = cfg.manual_alpha_value
            user_embed = long_g * a + att_fea_short * (1.0 - a)
            alpha_out = jnp.full((B, G), a, hist.dtype)

        model_output = jnp.concatenate([user_embed, ctx.target_emb], -1)

        aux: Dict[str, Any] = {
            "alpha": alpha_out,                     # [B, G]
            "att_fea_long": att_fea_long,           # [B, D]
            "att_fea_short": att_fea_short,         # [B, G, D]
            "hist_mean": hist_mean,                 # [B, D]
            "hist_recent": hist_recent,             # [B, D]
            "seq_len": seq_len,                     # [B]
            "embed_sumsq": sumsq_l + sumsq_s,
            "discrepancy_sumsq": sumsq_diff,
            "discrepancy_count": n_elems,
        }
        return model_output, aux
