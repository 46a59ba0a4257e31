"""LGN (reference lgn.py:31-556): LightGCN-style graph-convolved user/item
embeddings with a dot-product scorer.

  * item node embedding = concat(item_emb, cate_emb[item2cate]) —
    lgn.py:50-59.
  * ego = concat(user_table, item_node_table); n_layers of
    ego <- leaky_relu((D^-1(A+I)) ego W_k + b_k); final embedding = mean
    over [ego_0 .. ego_n] (lgn.py:107-132 _create_lightgcn_embed_ui).
  * score = dot(user_emb, item_emb); identity head (lgn.py:76-90).
  * The GCN recomputes every step (it is differentiable through the raw
    tables), exactly like the reference graph.  The fold-split sparse
    matmuls (lgn.py:107-132) become one `segment_sum` over COO edges.

Requires user_embedding_dim == item_embedding_dim + cate_embedding_dim for
the dot product (the reference config uses 40 == 32 + 8).

This model overrides __call__: it has no history encoder, no MLP head, and
its lazy L2 follows the reference in regularizing the GCN-OUTPUT rows of
the involved ids (the base class adds involved lookups AFTER the tables
were rewritten — lgn.py:46-72 + sequential_base_model.py:409-433).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clsr_tpu.data.batch import Batch
from clsr_tpu.data.graph import InteractionGraph
from clsr_tpu.models.base import SequentialModelBase, unique_rows_sumsq
from clsr_tpu.ops.initializers import get_initializer


class LGNModel(SequentialModelBase):

    graph: InteractionGraph = None

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        g = self.graph
        init = get_initializer(cfg.init_method, cfg.init_value)
        node_dim = cfg.item_embedding_dim + cfg.cate_embedding_dim
        if cfg.user_embedding_dim != node_dim:
            raise ValueError("LGN needs user_embedding_dim == item+cate dim")

        user_table = self.param("user_embedding", init,
                                (self.n_users, cfg.user_embedding_dim))
        item_table = self.param("item_embedding", init,
                                (self.n_items, cfg.item_embedding_dim))
        cate_table = self.param("cate_embedding", init,
                                (self.n_cates, cfg.cate_embedding_dim))

        item_nodes = jnp.concatenate(
            [item_table, cate_table[jnp.asarray(g.item2cate)]], axis=1)
        ego = jnp.concatenate([user_table, item_nodes], axis=0)

        src = jnp.asarray(g.src)
        dst = jnp.asarray(g.dst)
        w = jnp.asarray(g.weight)[:, None]
        n_nodes = self.n_users + self.n_items

        gcn_init = nn.initializers.normal(stddev=0.01)  # lgn.py:21
        all_embeddings = [ego]
        for k in range(cfg.n_layers):
            side = jax.ops.segment_sum(w * ego[dst], src,
                                       num_segments=n_nodes)
            W_k = self.param(f"W_gc_{k}", gcn_init, (node_dim, node_dim))
            b_k = self.param(f"b_gc_{k}", gcn_init, (node_dim,))
            ego = nn.leaky_relu(side @ W_k + b_k)
            all_embeddings.append(ego)
        final = jnp.mean(jnp.stack(all_embeddings, axis=1), axis=1)
        gcn_users, gcn_items = final[:self.n_users], final[self.n_users:]

        user_emb = gcn_users[batch.users]                  # [B, D]
        item_emb = gcn_items[batch.items]                  # [B, G, D]
        logits = jnp.einsum("bd,bgd->bg", user_emb, item_emb)

        # lazy L2: involved GCN-output item rows + raw cate rows, exactly
        # like the reference (items looked up from the rewritten table,
        # cates from the raw one; users never regularized)
        involved_items = jnp.concatenate(
            [batch.item_hist.reshape(-1), batch.items.reshape(-1)])
        involved_cates = jnp.concatenate(
            [batch.cate_hist.reshape(-1), batch.cates.reshape(-1)])
        embed_sumsq = (unique_rows_sumsq(gcn_items, involved_items)
                       + unique_rows_sumsq(cate_table, involved_cates))

        denom = jnp.maximum(batch.mask.sum(-1), 1.0)
        same_cate = (batch.cate_hist[:, None, :] == batch.cates[:, :, None])
        attn_labels = ((same_cate * batch.mask[:, None, :]).sum(-1)
                       / denom[:, None])
        return logits, {"embed_sumsq": embed_sumsq,
                        "attn_labels": attn_labels}
