"""NCF (reference ncf.py:15-103): GMF and MLP towers over dedicated user/
item embedding tables (all sized user_embedding_dim — reference quirk,
ncf.py:33-43), custom single-Dense head with no bias (ncf.py:92-103).

History is ignored; the four NCF tables are named *_embedding so they are
excluded from layer L2, and (like the reference, which never adds them to
embed_params) they receive no lazy L2 either."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.models.base import EmbedContext, SequentialModelBase
from clsr_tpu.ops.initializers import get_initializer


class NCFModel(SequentialModelBase):

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        d = cfg.user_embedding_dim

        from clsr_tpu.models.base import embedding_init, lookup_rows
        e_init = embedding_init(cfg, init)
        user_gmf = self.param("user_gmf_embedding", e_init, (self.n_users, d))
        user_mlp = self.param("user_mlp_embedding", e_init, (self.n_users, d))
        item_gmf = self.param("item_gmf_embedding", e_init, (self.n_items, d))
        item_mlp = self.param("item_mlp_embedding", e_init, (self.n_items, d))

        lr_ = lambda t, ids, n: lookup_rows(self, cfg, t, ids, n)
        u_gmf = lr_(user_gmf, batch.users,
                    "user_gmf_embedding")[:, None, :]          # [B,1,d]
        u_mlp = lr_(user_mlp, batch.users,
                    "user_mlp_embedding")[:, None, :]
        i_gmf = lr_(item_gmf, batch.items, "item_gmf_embedding")  # [B,G,d]
        i_mlp = lr_(item_mlp, batch.items, "item_mlp_embedding")

        gmf = u_gmf * i_gmf                            # [B, G, d]
        B, G = batch.items.shape
        mlp = jnp.concatenate(
            [jnp.broadcast_to(u_mlp, (B, G, d)), i_mlp], axis=-1)
        for idx, size in enumerate(cfg.ncf_layer_sizes):
            mlp = nn.Dense(size, kernel_init=nn.initializers.glorot_uniform(),
                           name=f"ncf_mlp_{idx}")(mlp)
            mlp = nn.relu(mlp)
        return jnp.concatenate([gmf, mlp], axis=-1), {}

    def head(self, model_output: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.Dense(1, use_bias=False,
                        kernel_init=nn.initializers.glorot_uniform(),
                        name="ncf_head")(model_output)[..., 0]
