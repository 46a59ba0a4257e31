"""GRU4Rec (reference gru4rec.py:21-76): GRU over the history, final state
concatenated with the target embedding into the shared head."""

from __future__ import annotations

import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import EmbedContext, SequentialModelBase
from clsr_tpu.ops.rnn import GRU


class GRU4RecModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        B, G = batch.items.shape
        hist = ctx.hist_input
        _, final_state = GRU(self.cfg.hidden_size, name="gru")(hist, batch.mask)
        final_g = jnp.broadcast_to(
            final_state[:, None, :], (B, G, final_state.shape[-1]))
        model_output = jnp.concatenate([final_g, ctx.target_emb], -1)
        return model_output, {}
