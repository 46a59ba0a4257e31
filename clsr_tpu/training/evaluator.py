"""Evaluation loop.

Mirrors SequentialBaseModel.run_weighted_eval (sequential_base_model.py:
244-292): per-batch device inference, host-side metric computation over
pointwise rows, (num_ngs+1)-sized groups, and per-user weighted metrics.

The grouped loader already packs each (1 pos + num_ngs neg) run of file
rows into one batch row with G targets, so preds [B, G] ARE the groups —
no reshape bookkeeping.  Flattened row order matches the file exactly
(row-major over [B, G]).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.metrics import (cal_mean_alpha_metric, cal_metric,
                              cal_weighted_metric)


def run_weighted_eval(eval_step: Callable, state, loader: SequenceLoader,
                      cfg: Config, num_ngs: int,
                      batch_groups: Optional[int] = None,
                      calc_mean_alpha: bool = False) -> Dict[str, float]:
    group = num_ngs + 1
    if batch_groups is None:
        batch_groups = max(1, cfg.batch_size // group)

    # Length-bucketed eval (cfg.length_buckets, round 5): groups are
    # bucketed by the anchor's history length and scored by per-Lb
    # compiled programs — the same ~78% padding-iteration saving as
    # bucketed training (docs/mask_density.jsonl), with NO quality
    # caveat: eval-mode BN uses running statistics and the metric
    # assembly below is order-invariant across groups.
    paddings = None
    if getattr(cfg, "length_buckets", "off") != "off":
        from clsr_tpu.data.resident import resolve_bucket_paddings
        n_rows = len(loader.view.labels)
        anchors = np.arange(0, n_rows, group)
        paddings = resolve_bucket_paddings(
            cfg, loader.view.lengths[anchors]) or None

    # Phase 1: dispatch all eval steps, keeping predictions ON DEVICE —
    # device->host reads inside the loop would serialize on transfer
    # latency (severe through remote-attached chips).
    pending = []
    for batch in loader.eval_batches(group_size=group,
                                     batch_groups=batch_groups,
                                     min_seq_length=cfg.min_seq_length,
                                     paddings=paddings):
        preds, alpha = eval_step(state, batch)
        nv = int(batch.valid.sum())
        pending.append((batch, preds, alpha, nv))

    # Phase 2: one bulk device->host transfer, then metric assembly
    fetched = jax.device_get([(p, a) for _, p, a, _ in pending])

    users_all, preds_all, labels_all, alphas_all = [], [], [], []
    group_preds, group_labels = [], []
    for (batch, _, _, nv), (preds, alpha) in zip(pending, fetched):
        preds = np.asarray(preds)[:nv]
        labels = np.asarray(batch.labels)[:nv]
        users = np.asarray(batch.users)[:nv]
        group_preds.append(preds)
        group_labels.append(labels)
        users_all.append(np.repeat(users, group))
        preds_all.append(preds.reshape(-1))
        labels_all.append(labels.reshape(-1))
        if calc_mean_alpha:
            alphas_all.append(np.asarray(alpha)[:nv].reshape(-1))

    users = np.concatenate(users_all)
    preds = np.concatenate(preds_all)
    labels = np.concatenate(labels_all)
    gp = np.concatenate(group_preds, axis=0)
    gl = np.concatenate(group_labels, axis=0)

    res = cal_metric(labels, preds, cfg.metrics)
    res.update(cal_metric(gl, gp, cfg.pairwise_metrics))
    res.update(cal_weighted_metric(users, preds, labels, cfg.weighted_metrics))
    if calc_mean_alpha:
        res.update(cal_mean_alpha_metric(np.concatenate(alphas_all), labels))
    return res


def predict_to_file(eval_step: Callable, state, loader: SequenceLoader,
                    cfg: Config, out_path: str,
                    batch_groups: Optional[int] = None) -> None:
    """Write sigmoid scores one per input line
    (sequential_base_model.py:326-347)."""
    if batch_groups is None:
        batch_groups = cfg.batch_size
    with open(out_path, "w") as f:
        for batch in loader.eval_batches(group_size=1,
                                         batch_groups=batch_groups):
            preds, _ = eval_step(state, batch)
            nv = int(batch.valid.sum())
            flat = np.asarray(preds)[:nv].reshape(-1)
            f.write("\n".join(str(x) for x in flat))
            f.write("\n")
