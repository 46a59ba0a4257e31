"""Shared sequential-model machinery.

TPU-native counterpart of the reference's SequentialBaseModel
(sequential_base_model.py:18-461) + BaseModel graph plumbing
(base_model.py:17-341), as a flax module:

  * item/cate embedding tables + history/target lookups with embedding
    dropout (sequential_base_model.py:354-452).
  * `target_item_embedding = concat(item, cate)` over G candidate targets
    per row ([B, G, item_dim+cate_dim]) — the grouped-target redesign (see
    clsr_tpu/data/batch.py).
  * lazy (involved-rows-only) L2 bookkeeping: the reference regularizes only
    the unique ids touched by the batch (sequential_base_model.py:409-433,
    clsr.py:118-127); here the sum-of-squares over unique rows is computed
    in-graph with a sort-and-dedup (static shapes, no tf.unique).
  * the shared logit head `_fcn_net(model_output, layer_sizes)`
    (sequential_base_model.py:72).

Subclasses implement `seq_graph(ctx, batch, train) -> (model_output, aux)`
with model_output [B, G, D] (the reference's `_build_seq_graph`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.ops.initializers import get_initializer
from clsr_tpu.ops.mlp import FcnNet
from clsr_tpu.parallel.embedding import gather_rows, gather_rows_replicated



def bn_stats_mask_active(cfg) -> bool:
    """Resolve cfg.bn_stats_mask: mask-aware attention-scorer BN batch
    statistics (ops/mlp.py:MaskedBatchNorm).  'auto' = on exactly when
    length-aware batching is — per-bucket padding proportions otherwise
    feed bucket-specific statistics into one shared running average
    (docs/RESULTS_r5.md quality cell)."""
    v = getattr(cfg, "bn_stats_mask", "auto")
    return v == "on" or (v == "auto"
                         and getattr(cfg, "length_buckets", "off") != "off")


def compute_dtype(cfg: Config):
    """None for float32 (default), else the jnp dtype for mixed precision."""
    if cfg.compute_dtype in ("float32", "f32", None):
        return None
    return jnp.dtype(cfg.compute_dtype)


def embedding_init(cfg: Config, init):
    """Table initializer honoring cfg.embedding_dtype (bf16 storage).

    The tables are the dominant HBM consumer at production scale
    (Kuaishou: 500k x 32 x 5 tables); bf16 storage halves both capacity
    and gather bandwidth.  Lookups are upcast to float32 immediately
    (see `lookup_dtype`) and LazyAdam keeps f32 moments + f32 update
    math, storing back round-to-nearest (training/lazy_adam.py).
    """
    if cfg.embedding_dtype == "bfloat16":
        return lambda key, shape: init(key, shape).astype(jnp.bfloat16)
    return init


def lookup_cast(cfg: Config, emb: jnp.ndarray) -> jnp.ndarray:
    """Upcast bf16-stored embedding rows to the f32 compute path."""
    if emb.dtype == jnp.bfloat16:
        return emb.astype(jnp.float32)
    return emb


def lookup_rows(module: "nn.Module", cfg: Config, table: jnp.ndarray,
                ids: jnp.ndarray, name: str) -> jnp.ndarray:
    """Gather + dequantize table rows.

    Serving can swap a table param for an int8 row-quantized version
    plus a `<name>_scales` [N, 1] float32 param
    (serving.py:ScoringService quantize_tables) — 4x less HBM and
    gather bandwidth at inference.  Detected here by dtype: int8 rows
    are dequantized with their gathered per-row scales; f32/bf16 tables
    take the normal path.  Training never sees int8 (the quantized
    state is a serving-side transform)."""
    from clsr_tpu.parallel.embedding import gather_rows

    rows = gather_rows(table, ids)
    if table.dtype == jnp.int8:
        scales = module.get_variable("params", f"{name}_scales")
        srows = gather_rows(scales, ids)            # ids.shape + (1,)
        return rows.astype(jnp.float32) * srows
    return lookup_cast(cfg, rows)

def unique_rows_sumsq(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """sum(||table[id]||^2) over the UNIQUE ids, jit-safe.

    Replaces tf.unique + l2_loss on the involved embedding rows
    (sequential_base_model.py:409-433).  Sorting the (static-size) id vector
    and masking duplicates gives the same value with static shapes.
    """
    flat = jnp.sort(ids.reshape(-1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    rows = gather_rows_replicated(table, flat).astype(jnp.float32)
    return jnp.sum(jnp.sum(rows * rows, axis=-1) * first)


def unique_rows_stats(table_a: jnp.ndarray, table_b: jnp.ndarray,
                      ids: jnp.ndarray):
    """(sumsq_a, sumsq_b, sum((a-b)^2), n_unique*dim) over unique ids.

    Used by CLSR for the involved-user L2 and the discrepancy loss
    (clsr.py:73-82, 118-127).
    """
    flat = jnp.sort(ids.reshape(-1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    ra = gather_rows_replicated(table_a, flat).astype(jnp.float32)
    rb = gather_rows_replicated(table_b, flat).astype(jnp.float32)
    fa = first[:, None].astype(ra.dtype)
    sumsq_a = jnp.sum(ra * ra * fa)
    sumsq_b = jnp.sum(rb * rb * fa)
    diff = ra - rb
    sumsq_diff = jnp.sum(diff * diff * fa)
    n_elems = jnp.sum(first) * table_a.shape[1]
    return sumsq_a, sumsq_b, sumsq_diff, n_elems


@dataclasses.dataclass
class EmbedContext:
    """Looked-up embeddings handed to seq_graph."""

    item_hist_emb: jnp.ndarray     # [B, L, item_dim]
    cate_hist_emb: jnp.ndarray     # [B, L, cate_dim]
    target_emb: jnp.ndarray        # [B, G, item_dim+cate_dim]
    item_table: jnp.ndarray
    cate_table: jnp.ndarray

    @property
    def hist_input(self) -> jnp.ndarray:
        """concat(item_hist, cate_hist) per clsr.py:145-147."""
        return jnp.concatenate([self.item_hist_emb, self.cate_hist_emb], -1)


class SequentialModelBase(nn.Module):
    """Base: embeddings + lookups + head.  Subclasses define seq_graph."""

    cfg: Config
    n_users: int
    n_items: int
    n_cates: int

    def _dropout(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Embedding dropout (sequential_base_model.py:440-452)."""
        rate = self.cfg.embedding_dropout
        if rate <= 0.0:
            return x
        return nn.Dropout(rate=rate, deterministic=not train)(x)

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        e_init = embedding_init(cfg, init)

        item_table = self.param(
            "item_embedding", e_init, (self.n_items, cfg.item_embedding_dim))
        cate_table = self.param(
            "cate_embedding", e_init, (self.n_cates, cfg.cate_embedding_dim))

        from clsr_tpu.training.compact_rows import active_compact
        cc = active_compact() or {}
        cr_item = cc.get("item_embedding")
        cr_cate = cc.get("cate_embedding")

        if cr_item is not None and cr_cate is not None:
            # compact row engine (training/compact_rows.py): lookups hit
            # the VMEM-sized gathered rows; L2 reuses them (no re-gather)
            item_hist_emb = lookup_cast(cfg, cr_item.site("hist"))
            cate_hist_emb = lookup_cast(cfg, cr_cate.site("hist"))
            target_emb = jnp.concatenate(
                [lookup_cast(cfg, cr_item.site("targets")),
                 lookup_cast(cfg, cr_cate.site("targets"))], axis=-1)
            embed_sumsq = (cr_item.sumsq_unique() + cr_cate.sumsq_unique())
        else:
            item_hist_emb = lookup_rows(self, cfg, item_table,
                                        batch.item_hist, "item_embedding")
            cate_hist_emb = lookup_rows(self, cfg, cate_table,
                                        batch.cate_hist, "cate_embedding")
            target_emb = jnp.concatenate(
                [lookup_rows(self, cfg, item_table, batch.items,
                             "item_embedding"),
                 lookup_rows(self, cfg, cate_table, batch.cates,
                             "cate_embedding")], axis=-1)

            # lazy L2 bookkeeping BEFORE dropout, on raw table rows
            involved_items = jnp.concatenate(
                [batch.item_hist.reshape(-1), batch.items.reshape(-1)])
            involved_cates = jnp.concatenate(
                [batch.cate_hist.reshape(-1), batch.cates.reshape(-1)])
            embed_sumsq = (unique_rows_sumsq(item_table, involved_items)
                           + unique_rows_sumsq(cate_table, involved_cates))

        item_hist_emb = self._dropout(item_hist_emb, train)
        cate_hist_emb = self._dropout(cate_hist_emb, train)
        target_emb = self._dropout(target_emb, train)

        ctx = EmbedContext(
            item_hist_emb=item_hist_emb,
            cate_hist_emb=cate_hist_emb,
            target_emb=target_emb,
            item_table=item_table,
            cate_table=cate_table,
        )

        model_output, aux = self.seq_graph(ctx, batch, train)

        logits = self.head(model_output, train)                # [B, G]

        aux = dict(aux)
        if not train:
            # pre-head concat embedding — the tensor the reference's
            # 'model_output' histogram actually streams (clsr.py:276).
            # Only the eval-mode histogram probe (training/steps.py)
            # reads it; gated on eval so TRAIN programs' traced HLO (and
            # their 5-10 min relay compile-cache entries) stay identical.
            aux["model_output"] = model_output
        aux["embed_sumsq"] = aux.get("embed_sumsq", 0.0) + embed_sumsq
        if batch.cates.ndim == 2:
            # on-device supervised-attention label: fraction of history
            # sharing the target's category (sequential_iterator.py:619,682)
            denom = jnp.maximum(batch.mask.sum(-1), 1.0)
            same_cate = (batch.cate_hist[:, None, :]
                         == batch.cates[:, :, None])
            aux["attn_labels"] = (
                (same_cate * batch.mask[:, None, :]).sum(-1)
                / denom[:, None])
        return logits, aux

    def head(self, model_output: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Shared logit head (sequential_base_model.py:72); NCF overrides."""
        cfg = self.cfg
        init = get_initializer(cfg.init_method, cfg.init_value)
        return FcnNet(
            cfg.layer_sizes, cfg.activation, enable_bn=cfg.enable_bn,
            out_dim=1, kernel_init=init,
            dropout_rates=cfg.dropout if cfg.user_dropout else None,
            dtype=compute_dtype(cfg),
            name="logit_fcn",
        )(model_output, train=train)[..., 0]

    def seq_graph(self, ctx: EmbedContext, batch: Batch, train: bool):
        raise NotImplementedError
