"""Device-resident training data.

The reference streams every batch from the host each step
(sequential_iterator.py:194-503: parse -> numpy assembly -> feed_dict),
so training throughput is bounded by the host pipeline.  On TPU the
padded dataset is small relative to HBM (Taobao-dims: ~1KB/example), so
the TPU-native design is to upload the padded dataset ONCE and do batch
*selection* on device:

  * `ResidentDataset` — the padded arrays (ids, lengths, exact
    parser-computed time features) as one device pytree.  The [N, L]
    history mask is derived on device from `lengths` (saves 200B/example
    of HBM and upload).
  * `gather_batch` — fancy-gather of B rows into a regular
    `clsr_tpu.data.batch.Batch`, inside jit.
  * `make_resident_multi_step` — K optimizer steps per dispatch
    (lax.scan), each step slicing its B row indices from a device-resident
    epoch permutation at a per-call offset.  Per-dispatch host->device
    traffic: the donated train state handle, one rng key, and two scalars.

Per-epoch host work collapses to one `np.random.permutation` and a ~4B/row
upload; steady-state feed rate is bounded by HBM gather bandwidth, not the
host.  Semantics (shuffling, min_seq_length filter, the drop of a trailing
batch with < 5 rows — sequential_iterator.py:338-339) match the streaming
loader; differential tests assert step-for-step equality with the host
path.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.data.loader import PaddedView


@flax.struct.dataclass
class ResidentDataset:
    """Padded dataset as a device pytree (one upload per training run)."""

    users: jnp.ndarray       # [N] int32
    items: jnp.ndarray       # [N] int32 (positive target)
    cates: jnp.ndarray       # [N] int32
    labels: jnp.ndarray      # [N] float32
    lengths: jnp.ndarray     # [N] int32 (clamped to max_seq_length)
    item_hist: jnp.ndarray   # [N, L] int32, left-aligned, 0-padded
    cate_hist: jnp.ndarray   # [N, L] int32
    time_diff: jnp.ndarray   # [N, L] float32 (log-scaled, parser-exact)
    time_from_first: jnp.ndarray
    time_to_now: jnp.ndarray

    @property
    def n_rows(self) -> int:
        return self.users.shape[0]

    @property
    def seq_len(self) -> int:
        return self.item_hist.shape[1]

    def nbytes(self) -> int:
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(self))


def resident_nbytes_estimate(n_rows: int, max_seq_length: int) -> int:
    """Upload size estimate (for the auto-placement decision)."""
    per_row = 5 * 4 + max_seq_length * (2 * 4 + 3 * 4)
    return n_rows * per_row


def build_resident(view: PaddedView, device=None,
                   sharding=None) -> ResidentDataset:
    """Upload a PaddedView's arrays to the device (or a NamedSharding)."""
    L = view.item_hist.shape[1]
    host = ResidentDataset(
        users=view.users.astype(np.int32),
        items=view.items.astype(np.int32),
        cates=view.cates.astype(np.int32),
        labels=view.labels.astype(np.float32),
        lengths=np.minimum(view.lengths, L).astype(np.int32),
        item_hist=view.item_hist,
        cate_hist=view.cate_hist,
        time_diff=view.time_diff,
        time_from_first=view.time_from_first,
        time_to_now=view.time_to_now,
    )
    target = sharding if sharding is not None else device
    if target is not None:
        return jax.device_put(host, target)
    return jax.device_put(host)


def gather_batch(res: ResidentDataset, idx: jnp.ndarray,
                 valid: jnp.ndarray) -> Batch:
    """Gather rows `idx` [B] into a Batch (G=1), deriving the mask.

    Invalid rows (batch padding past the epoch's end) are zeroed so the
    result is bit-identical to the host loader's zero-padded partial
    batches — the pad rows' ids must not leak into the lazy-L2 unique-id
    set, LazyAdam's touched rows, or the BN batch statistics.
    """
    L = res.seq_len
    vi = valid.astype(jnp.int32)
    vf = valid.astype(jnp.float32)
    lengths = res.lengths[idx] * vi
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
    return Batch(
        users=res.users[idx] * vi,
        items=(res.items[idx] * vi)[:, None],
        cates=(res.cates[idx] * vi)[:, None],
        labels=(res.labels[idx] * vf)[:, None],
        item_hist=res.item_hist[idx] * vi[:, None],
        cate_hist=res.cate_hist[idx] * vi[:, None],
        mask=mask,
        time_diff=res.time_diff[idx] * vf[:, None],
        time_from_first=res.time_from_first[idx] * vf[:, None],
        time_to_now=res.time_to_now[idx] * vf[:, None],
        valid=vf,
    )


def epoch_permutation(eligible: np.ndarray, np_rng: np.random.RandomState,
                      batch_size: int, steps_per_call: int,
                      min_batch_rows: int = 5
                      ) -> Tuple[np.ndarray, int, int, int]:
    """Shuffle eligible row ids; compute the epoch's call layout.

    Returns (perm padded to a whole number of batches, n_use, n_calls,
    n_tail_batches).  A trailing batch with fewer than `min_batch_rows`
    real rows is dropped, like the reference (sequential_iterator.py:338).
    """
    perm = np_rng.permutation(eligible).astype(np.int32)
    n = len(perm)
    rem = n % batch_size
    if rem and rem < min_batch_rows:
        n -= rem  # reference drops the tiny trailing batch
    n_batches = -(-n // batch_size) if n else 0
    n_calls = n_batches // steps_per_call
    n_tail = n_batches - n_calls * steps_per_call
    padded_len = max(n_batches * batch_size, batch_size)
    out = np.zeros(padded_len, dtype=np.int32)
    out[:n] = perm[:n]
    return out, n, n_calls, n_tail


def make_resident_step(model, cfg: Config) -> Callable:
    """Single resident step: (state, res, perm, n_rows, offset, rng)."""
    from clsr_tpu.training.steps import make_train_step_fn

    raw = make_train_step_fn(model, cfg)
    B = cfg.batch_size

    def step(state, res: ResidentDataset, perm: jnp.ndarray,
             n_rows: jnp.ndarray, offset: jnp.ndarray, rng: jax.Array):
        idx = jax.lax.dynamic_slice(perm, (offset,), (B,))
        valid = (offset + jnp.arange(B)) < n_rows
        batch = gather_batch(res, idx, valid)
        return raw(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,))


def make_resident_multi_step(model, cfg: Config,
                             steps_per_call: int) -> Callable:
    """K resident steps per dispatch.

    multi(state, res, perm, n_rows, offset, rng) -> (state, LossParts[K]).
    `offset` is the flat row offset of the call's first batch; step k uses
    rows [offset + k*B, offset + (k+1)*B).
    """
    from clsr_tpu.training.steps import make_train_step_fn

    raw = make_train_step_fn(model, cfg)
    B = cfg.batch_size

    def multi(state, res: ResidentDataset, perm: jnp.ndarray,
              n_rows: jnp.ndarray, offset: jnp.ndarray, rng: jax.Array):
        def body(st, k):
            start = offset + k * B
            idx = jax.lax.dynamic_slice(perm, (start,), (B,))
            valid = (start + jnp.arange(B)) < n_rows
            batch = gather_batch(res, idx, valid)
            return raw(st, batch, jax.random.fold_in(rng, k))

        return jax.lax.scan(body, state, jnp.arange(steps_per_call))

    return jax.jit(multi, donate_argnums=(0,))
