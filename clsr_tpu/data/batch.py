"""The on-device batch structure.

TPU-first redesign of the reference's feed_dict layout
(sequential_iterator.py:47-70):

  * The reference replicates every positive row (1 + num_ngs) times on the
    host so each of the 5 candidate targets gets its own full history copy.
    Here a batch row carries its history ONCE and `G` candidate targets
    (`items`/`cates`/`labels` have shape [B, G]); the encoders run once per
    row and only the target-conditioned heads fan out over G.  For training
    G == 1 (negatives are sampled on-device); for grouped evaluation
    G == 1 + num_ngs (e.g. 100 on the Taobao test protocol).
  * `valid` masks padding rows so every batch has a static shape (XLA
    compiles one program per shape).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Batch:
    users: jnp.ndarray            # [B] int32
    items: jnp.ndarray            # [B, G] int32 — target candidates, col 0 positive
    cates: jnp.ndarray            # [B, G] int32
    labels: jnp.ndarray           # [B, G] float32
    item_hist: jnp.ndarray        # [B, L] int32, left-aligned, 0-padded
    cate_hist: jnp.ndarray        # [B, L] int32
    mask: jnp.ndarray             # [B, L] float32 — 1 on valid history steps
    time_diff: jnp.ndarray        # [B, L] float32 (log-scaled, see parser)
    time_from_first: jnp.ndarray  # [B, L] float32
    time_to_now: jnp.ndarray      # [B, L] float32
    valid: jnp.ndarray            # [B] float32 — 1 on real rows, 0 on padding

    @property
    def batch_rows(self) -> int:
        return self.users.shape[0]

    @property
    def group_size(self) -> int:
        return self.items.shape[1]

    @property
    def seq_len(self) -> int:
        return self.item_hist.shape[1]


def pad_batch_arrays(arrays: dict, target_rows: int) -> dict:
    """Pad every leading-axis array up to `target_rows` with zeros."""
    out = {}
    for key, arr in arrays.items():
        arr = np.asarray(arr)
        n = arr.shape[0]
        if n < target_rows:
            pad = np.zeros((target_rows - n,) + arr.shape[1:], dtype=arr.dtype)
            arr = np.concatenate([arr, pad], axis=0)
        out[key] = arr
    return out
