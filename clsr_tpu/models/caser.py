"""Caser (reference caser.py:37-106): vertical + horizontal 1-D CNNs over
the item and category history matrices, max-pooled, concat target.

Quirks preserved: no masking (padding zeros enter the convolutions), the
"vertical" conv runs over the embedding axis with the time axis as channels
(caser.py:62-66), horizontal filters of every width 1..L are max-pooled
over time (caser.py:67-74)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import EmbedContext, SequentialModelBase


class CaserModel(SequentialModelBase):

    def _caser_cnn(self, hist_matrix: jnp.ndarray, vertical_dim: int,
                   scope: str) -> jnp.ndarray:
        cfg = self.cfg
        # vertical: [B, D, L] conv over D with window D -> [B, 1, n_v]
        embedding_T = jnp.swapaxes(hist_matrix, 1, 2)
        out_v = nn.Conv(cfg.n_v, kernel_size=(vertical_dim,),
                        padding="VALID", name=f"{scope}_conv_v")(embedding_T)
        out_v = nn.relu(out_v).reshape(out_v.shape[0], -1)
        # horizontal: filters of width 1..L over time, max-pool
        outs = [out_v]
        for h in range(1, cfg.L + 1):
            conv = nn.Conv(cfg.n_h, kernel_size=(h,), padding="VALID",
                           name=f"{scope}_conv_h{h}")(hist_matrix)
            outs.append(jnp.max(nn.relu(conv), axis=1))
        return jnp.concatenate(outs, axis=1)

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        B, G = batch.items.shape
        item_out = self._caser_cnn(ctx.item_hist_emb,
                                   cfg.item_embedding_dim, "item")
        cate_out = self._caser_cnn(ctx.cate_hist_emb,
                                   cfg.cate_embedding_dim, "cate")
        cnn_output = jnp.concatenate([item_out, cate_out], axis=1)
        out_g = jnp.broadcast_to(cnn_output[:, None, :],
                                 (B, G, cnn_output.shape[-1]))
        return jnp.concatenate([out_g, ctx.target_emb], -1), {}
