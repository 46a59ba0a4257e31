"""Loss assembly.

Reproduces the reference's four-part CLSR objective (clsr.py:22-34):
  loss = data + regular + contrastive + discrepancy

  * data loss — grouped softmax over the (1 + num_ngs) candidate logits
    (base_model.py:215-235): softmax across the group, -group * mean(log p)
    where non-positive entries contribute log(1)=0 but count in the mean —
    algebraically the mean over groups of -log p(positive).  Pointwise
    cross_entropy/log/square losses per base_model.py:191-214.
  * regular loss — L2/L1 with LAZY embedding regularization: only the
    unique rows touched by the batch (via aux["embed_sumsq"], see
    models/base.py) plus all non-embedding-table params
    (base_model.py:118-159, sequential_base_model.py:454-461; tf.nn.l2_loss
    = sum(x^2)/2).
  * contrastive loss — bpr (softplus) or triplet (elementwise squared
    distances, per-dimension margin, summed — clsr.py:46-71) over the 4
    (anchor, pos, neg) orderings among {att_fea_long, att_fea_short,
    hist_mean, hist_recent}, masked to rows with seq_len >
    contrastive_length_threshold, x contrastive_loss_weight.
  * discrepancy loss — NEGATIVE mean squared difference of the two user
    tables' involved rows (pushes long/short apart, clsr.py:73-82).

All means respect Batch.valid so zero-padded rows (static batch shapes)
contribute nothing.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch


@flax.struct.dataclass
class LossParts:
    loss: jnp.ndarray
    data_loss: jnp.ndarray
    regular_loss: jnp.ndarray
    contrastive_loss: jnp.ndarray
    discrepancy_loss: jnp.ndarray


def _is_embedding_table(path: Tuple[str, ...]) -> bool:
    """Embedding tables live at the top level with an *_embedding name
    (the reference's 'sequential/embedding' scope,
    sequential_base_model.py:454-461)."""
    return path[-1].endswith("_embedding")


def layer_param_sums(params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of squares, sum of abs) over all non-embedding-table params."""
    flat = flax.traverse_util.flatten_dict(params)
    sumsq = 0.0
    sumabs = 0.0
    for path, leaf in flat.items():
        if _is_embedding_table(path):
            continue
        sumsq = sumsq + jnp.sum(leaf * leaf)
        sumabs = sumabs + jnp.sum(jnp.abs(leaf))
    return sumsq, sumabs


def data_loss_fn(cfg: Config, logits: jnp.ndarray, labels: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """logits/labels [B, G] (or [B, G, L] per-position — NextItNet's
    transpose-to-(row, position) groups, base_model.py:218-228), valid [B]."""
    if logits.ndim == 3:
        B, G, L = logits.shape
        logits = jnp.moveaxis(logits, 2, 1).reshape(B * L, G)
        labels = jnp.moveaxis(labels, 2, 1).reshape(B * L, G)
        valid = jnp.repeat(valid, L)
    G = logits.shape[1]
    w = valid  # [B]
    n_valid = jnp.maximum(w.sum(), 1.0)
    if cfg.loss == "softmax":
        logp = jax.nn.log_softmax(logits, axis=-1)
        pos_logp = jnp.sum(logp * labels, axis=-1)        # [B]
        return -(pos_logp * w).sum() / n_valid
    # pointwise losses over all B*G entries, valid-weighted
    wflat = jnp.broadcast_to(w[:, None], logits.shape)
    denom = jnp.maximum(wflat.sum(), 1.0)
    if cfg.loss == "cross_entropy_loss":
        ce = (jnp.maximum(logits, 0.0) - logits * labels
              + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return (ce * wflat).sum() / denom
    pred = jax.nn.sigmoid(logits) if cfg.method == "classification" else logits
    if cfg.loss == "square_loss":
        return jnp.sqrt(((pred - labels) ** 2 * wflat).sum() / denom)
    if cfg.loss == "log_loss":
        eps = 1e-7  # tf.losses.log_loss epsilon
        ll = -(labels * jnp.log(pred + eps)
               + (1.0 - labels) * jnp.log(1.0 - pred + eps))
        return (ll * wflat).sum() / denom
    raise ValueError(f"this loss not defined {cfg.loss}")


def regular_loss_fn(cfg: Config, params, aux: Dict[str, Any]) -> jnp.ndarray:
    layer_sumsq, layer_sumabs = layer_param_sums(params)
    embed_sumsq = aux.get("embed_sumsq", 0.0)
    l2 = 0.5 * cfg.embed_l2 * embed_sumsq + 0.5 * cfg.layer_l2 * layer_sumsq
    l1 = cfg.layer_l1 * layer_sumabs
    if cfg.embed_l1:
        l1 = l1 + cfg.embed_l1 * aux.get("embed_sumabs", 0.0)
    return l2 + l1


def contrastive_loss_fn(cfg: Config, aux: Dict[str, Any], batch: Batch
                        ) -> jnp.ndarray:
    """clsr.py:46-71 over the [B, G] grid (see models/clsr.py docstring)."""
    long_f = aux["att_fea_long"][:, None, :]      # [B, 1, D]
    short_f = aux["att_fea_short"]                # [B, G, D]
    mean_f = aux["hist_mean"][:, None, :]
    recent_f = aux["hist_recent"][:, None, :]
    B, G, D = short_f.shape
    long_f = jnp.broadcast_to(long_f, (B, G, D))
    mean_f = jnp.broadcast_to(mean_f, (B, G, D))
    recent_f = jnp.broadcast_to(recent_f, (B, G, D))

    cmask = ((aux["seq_len"] > cfg.contrastive_length_threshold)
             .astype(jnp.float32) * batch.valid)[:, None]   # [B, 1]
    cmask = jnp.broadcast_to(cmask, (B, G))
    denom = jnp.maximum(cmask.sum(), 1.0)

    def masked_mean(per_row):                      # per_row [B, G]
        return (cmask * per_row).sum() / denom

    if cfg.contrastive_loss == "bpr":
        def bpr(anchor, pos, neg):
            return masked_mean(jax.nn.softplus(
                jnp.sum(anchor * (neg - pos), -1)))
        loss = (bpr(long_f, mean_f, recent_f)
                + bpr(short_f, recent_f, mean_f)
                + bpr(mean_f, long_f, short_f)
                + bpr(recent_f, short_f, long_f))
    elif cfg.contrastive_loss == "triplet":
        margin = cfg.triplet_margin
        d_lm = jnp.square(long_f - mean_f)
        d_lr = jnp.square(long_f - recent_f)
        d_sm = jnp.square(short_f - mean_f)
        d_sr = jnp.square(short_f - recent_f)

        def trip(d_ap, d_an):
            return masked_mean(
                jnp.sum(jnp.maximum(0.0, d_ap - d_an + margin), -1))
        loss = (trip(d_lm, d_lr) + trip(d_sr, d_sm)
                + trip(d_lm, d_sm) + trip(d_sr, d_lr))
    else:
        raise ValueError(cfg.contrastive_loss)
    return cfg.contrastive_loss_weight * loss


def discrepancy_loss_fn(cfg: Config, aux: Dict[str, Any]) -> jnp.ndarray:
    """clsr.py:73-82 — note the NEGATIVE sign."""
    mean_sq = aux["discrepancy_sumsq"] / jnp.maximum(
        aux["discrepancy_count"], 1.0)
    return -cfg.discrepancy_loss_weight * mean_sq


def attn_loss_fn(cfg: Config, aux: Dict[str, Any], batch: Batch
                 ) -> jnp.ndarray:
    """Supervised fusion loss (opt-in extension, cfg.use_attn_loss):
    attn_loss_weight * mse(alpha, attn_labels) over valid rows.  The
    reference carries attn_loss_weight but never adds this term; the CLSR
    paper's supervision of the fusion gate is exactly this quantity (the
    reference logs its sqrt as a summary, clsr.py:267-271)."""
    alpha = aux["alpha"]                     # [B, G]
    labels = aux["attn_labels"]              # [B, G]
    w = jnp.broadcast_to(batch.valid[:, None], alpha.shape)
    denom = jnp.maximum(w.sum(), 1.0)
    mse = ((alpha - labels) ** 2 * w).sum() / denom
    return cfg.attn_loss_weight * mse


def total_loss(cfg: Config, logits: jnp.ndarray, aux: Dict[str, Any],
               batch: Batch, params) -> LossParts:
    data = data_loss_fn(cfg, logits, batch.labels, batch.valid)
    regular = regular_loss_fn(cfg, params, aux)
    if cfg.model_type.lower() == "clsr":
        contrastive = contrastive_loss_fn(cfg, aux, batch)
        discrepancy = discrepancy_loss_fn(cfg, aux)
    else:
        contrastive = jnp.zeros(())
        discrepancy = jnp.zeros(())
    loss = data + regular + contrastive + discrepancy
    if (cfg.use_attn_loss and "alpha" in aux and "attn_labels" in aux):
        loss = loss + attn_loss_fn(cfg, aux, batch)
    return LossParts(
        loss=loss,
        data_loss=data,
        regular_loss=regular,
        contrastive_loss=contrastive,
        discrepancy_loss=discrepancy,
    )
