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


def _round_up8(x: int) -> int:
    return -(-int(x) // 8) * 8


def choose_bucket_edges(lengths: np.ndarray, L: int,
                        min_rows: int = 1024,
                        max_buckets: int = 3,
                        min_gain: float = 1.10) -> list:
    """Pick length-bucket boundaries minimizing executed scan iterations.

    The measured history-length distribution is heavily short-skewed
    (expanding histories, sequential_reviews.py:358-438 — mean ~11 of
    L=50 on taobao-shaped data, docs/mask_density.jsonl), so padding to
    one global L makes ~4/5 of all scan/attention iterations masked
    carry-through work.  This brute-forces 1-3 buckets over multiple-of-8
    candidate boundaries, minimizing sum_b rows_b * L_b (a linear-in-L
    proxy for the scan/attention cost), subject to:

      * STRICT boundaries: a bucket padded to Lb only holds rows with
        clamped length <= Lb - 1, so column Lb-1 stays padding and the
        reference's padded time_to_now[:, -1] fusion input
        (clsr.py:239-248) remains exactly 0 — including for the top
        bucket, whose Lb may shrink below L when no row fills L;
      * every bucket holds >= min_rows rows (no near-empty programs);
      * each extra bucket (extra compiled program) must improve the
        executed-iteration count by >= min_gain x.

    Returns the FULL ascending list of bucket paddings [L1, ..., Ltop]
    (the last entry is the top bucket's padding, <= L).
    """
    tl = np.minimum(np.asarray(lengths), L).astype(np.int64)
    n = len(tl)
    if n == 0:
        return [L]
    max_tl = int(tl.max())
    # top padding: smallest multiple of 8 with max_tl <= top - 1 (strict),
    # except keep top = L when the data actually fills L (the reference's
    # own shape; rows with tl == L legitimately expose time_to_now[:,L-1])
    top = L if max_tl >= L else min(L, _round_up8(max_tl + 1))
    counts = np.bincount(tl, minlength=L + 1).astype(np.int64)
    cum_rows = np.cumsum(counts)           # rows with tl <= i

    def cost(edges):
        # edges: ascending inner boundaries, then top
        total = 0
        prev = -1
        for e in edges:
            hi = e - 1 if e < top else top
            rows = int(cum_rows[min(hi, L)] - (cum_rows[prev]
                                               if prev >= 0 else 0))
            if e < top and rows < min_rows:
                return None
            total += rows * e
            prev = min(hi, L)
        return total

    cands = [e for e in range(8, top, 8)]
    best = [top]
    best_cost = cost(best)
    for k in range(1, max_buckets):
        improved = None
        import itertools
        for combo in itertools.combinations(cands, k):
            c = cost(list(combo) + [top])
            if c is not None and (improved is None or c < improved[0]):
                improved = (c, list(combo) + [top])
        if improved is None or best_cost / improved[0] < min_gain:
            break
        best_cost, best = improved
    return best


def bucket_rows(lengths: np.ndarray, L: int, paddings: list):
    """Partition row ids by clamped length into per-bucket id arrays.

    `paddings`: ascending bucket paddings from choose_bucket_edges (or
    parsed from cfg.length_buckets + the top).  Bucket with padding Lb
    holds rows with clamped length in [prev, Lb - 1]; the top bucket
    takes everything else (up to L).  Returns [(Lb, row_ids)] — empty
    buckets dropped.
    """
    tl = np.minimum(np.asarray(lengths), L).astype(np.int64)
    out = []
    prev = 0
    for i, e in enumerate(paddings):
        top = i == len(paddings) - 1
        hi = L if top else e - 1
        rows = np.flatnonzero((tl >= prev) & (tl <= hi))
        if len(rows):
            out.append((int(e), rows))
        prev = hi + 1
    return out


class _SubView:
    """Row/column slice of a PaddedView (host arrays, bucket-padded)."""

    def __init__(self, view: PaddedView, rows: np.ndarray, Lb: int):
        self.users = view.users[rows]
        self.items = view.items[rows]
        self.cates = view.cates[rows]
        self.labels = view.labels[rows]
        self.lengths = view.lengths[rows]
        self.item_hist = view.item_hist[rows][:, :Lb]
        self.cate_hist = view.cate_hist[rows][:, :Lb]
        self.time_diff = view.time_diff[rows][:, :Lb]
        self.time_from_first = view.time_from_first[rows][:, :Lb]
        self.time_to_now = view.time_to_now[rows][:, :Lb]


class _PadRows:
    """Row-count round-up with all-zero rows (length 0 — never eligible,
    never gathered).  Stabilizes resident program shapes across datasets
    (cfg.resident_round_rows): one compiled program serves every seed of
    a study instead of one 5-10 min TPU relay compile per dataset."""

    _FIELDS = ("users", "items", "cates", "labels", "lengths",
               "item_hist", "cate_hist", "time_diff", "time_from_first",
               "time_to_now")

    def __init__(self, view, multiple: int):
        n = len(view.users)
        r = (-n) % multiple
        for f in self._FIELDS:
            x = np.asarray(getattr(view, f))
            if r:
                x = np.concatenate(
                    [x, np.zeros((r,) + x.shape[1:], x.dtype)])
            setattr(self, f, x)


def pad_view_rows(view, multiple: int):
    if multiple and multiple > 1:
        return _PadRows(view, multiple)
    return view


def resolve_bucket_paddings(cfg: Config, lengths: np.ndarray) -> list:
    """cfg.length_buckets -> ascending bucket paddings (or [] = off)."""
    lb = getattr(cfg, "length_buckets", "off")
    L = cfg.max_seq_length
    if lb == "off":
        return []
    if lb == "auto":
        pads = choose_bucket_edges(lengths, L,
                                   min_rows=max(1024, 2 * cfg.batch_size))
        return pads if len(pads) > 1 or pads[0] < L else []
    edges = [int(e) for e in lb.split(",")]
    tl = np.minimum(np.asarray(lengths), L)
    max_tl = int(tl.max()) if len(tl) else L
    top = L if max_tl >= L else min(L, _round_up8(max_tl + 1))
    return [e for e in edges if e < top] + [top]


def build_resident_buckets(view: PaddedView, paddings: list,
                           mesh=None, flat: bool = False,
                           round_rows: int = 0):
    """Per-bucket ResidentDatasets (device- or mesh-resident).

    Returns [(res_b, rows_b)]: rows_b maps bucket-LOCAL row ids back to
    dataset rows (permutations index locally; the map is for tests /
    debugging).  Total HBM cost is LOWER than the unbucketed upload —
    short rows store Lb, not L, columns."""
    out = []
    for Lb, rows in bucket_rows(view.lengths, view.item_hist.shape[1],
                                paddings):
        sub = pad_view_rows(_SubView(view, rows, Lb), round_rows)
        res = (build_resident_mesh(sub, mesh, flat) if mesh is not None
               else build_resident(sub))
        out.append((res, rows))
    return out


def resident_sharding(mesh, flat: bool = False):
    """ResidentDataset-shaped NamedSharding pytree: rows over the batch
    axes (P('data') or P(('data','model')) in flat mode), feature axes
    replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clsr_tpu.parallel.embedding import batch_axes
    bax = batch_axes(flat)
    r1 = NamedSharding(mesh, P(bax))
    r2 = NamedSharding(mesh, P(bax, None))
    return ResidentDataset(
        users=r1, items=r1, cates=r1, labels=r1, lengths=r1,
        item_hist=r2, cate_hist=r2, time_diff=r2, time_from_first=r2,
        time_to_now=r2)


def build_resident_mesh(view: PaddedView, mesh, flat: bool = False
                        ) -> ResidentDataset:
    """Upload the padded dataset ROW-SHARDED over the mesh's batch axes
    (VERDICT r2 item 2: mesh-resident training data).

    Rows are padded with zeros to a multiple of the batch-shard count so
    every device holds an equal block; the epoch permutation only ever
    indexes real rows, so the pad rows are never gathered.  Per-device
    HBM cost drops n-fold vs a replicated upload."""
    import numpy as np

    from clsr_tpu.parallel.embedding import batch_axes
    bax = batch_axes(flat)
    n = int(np.prod([mesh.shape[a] for a in bax]))
    L = view.item_hist.shape[1]

    def pad(x, dtype=None):
        x = np.asarray(x)
        if dtype is not None:
            x = x.astype(dtype)
        r = (-x.shape[0]) % n
        if r:
            x = np.concatenate(
                [x, np.zeros((r,) + x.shape[1:], x.dtype)])
        return x

    host = ResidentDataset(
        users=pad(view.users, np.int32),
        items=pad(view.items, np.int32),
        cates=pad(view.cates, np.int32),
        labels=pad(view.labels, np.float32),
        lengths=pad(np.minimum(view.lengths, L), np.int32),
        item_hist=pad(view.item_hist),
        cate_hist=pad(view.cate_hist),
        time_diff=pad(view.time_diff),
        time_from_first=pad(view.time_from_first),
        time_to_now=pad(view.time_to_now),
    )
    return jax.tree_util.tree_map(jax.device_put, host,
                                  resident_sharding(mesh, flat))


def gather_batch_mesh(mesh, flat: bool, res: ResidentDataset,
                      idx: jnp.ndarray, valid: jnp.ndarray) -> Batch:
    """gather_batch over a row-sharded ResidentDataset.

    The epoch permutation assigns arbitrary dataset rows to arbitrary
    batch positions, so a row a device needs may live on another shard.
    Under GSPMD a plain gather on a sharded operand with replicated
    indices would ALL-GATHER the dataset; instead each shard gathers the
    batch rows it OWNS (gather_batch with off-shard rows masked to
    zero) and ONE psum_scatter over the batch axes delivers each device
    exactly its own [B/n] block (every position is owned by exactly one
    shard; a full psum + slice would pay the all-gather half of the
    exchange for data that is immediately discarded) — O(B x row_bytes)
    on the wire per step, independent of dataset size.  Output leaves
    are sharded P(batch_axes) like a host-fed batch, so the train step
    is indistinguishable from the streaming path."""
    from jax.sharding import PartitionSpec as P

    from clsr_tpu.parallel.embedding import batch_axes
    bax = batch_axes(flat)
    n = int(np.prod([mesh.shape[a] for a in bax]))
    B = idx.shape[0]
    if B % n:
        raise ValueError(f"batch {B} not divisible by {n} batch shards")

    def local(res_l, idx, valid):
        k = jax.lax.axis_index(bax[0])
        for a in bax[1:]:
            k = k * mesh.shape[a] + jax.lax.axis_index(a)
        rows = res_l.users.shape[0]
        loc = idx - k * rows
        ok = (loc >= 0) & (loc < rows)
        part = gather_batch(res_l, jnp.where(ok, loc, 0), valid & ok)

        def red(x):
            # block order over the tuple axes matches k (data-major)
            return jax.lax.psum_scatter(x, bax, scatter_dimension=0,
                                        tiled=True)

        return jax.tree_util.tree_map(red, part)

    res_specs = jax.tree_util.tree_map(
        lambda s: s.spec, resident_sharding(mesh, flat))
    b1 = P(bax)
    b2 = P(bax, None)
    out_specs = Batch(users=b1, items=b2, cates=b2, labels=b2,
                      item_hist=b2, cate_hist=b2, mask=b2, time_diff=b2,
                      time_from_first=b2, time_to_now=b2, valid=b1)
    # check_vma off: idx/valid are replicated operands feeding per-shard
    # masked gathers; the checker cannot infer the psum-assembled batch
    # blocks are exchange-consistent
    return jax.shard_map(
        local, mesh=mesh, in_specs=(res_specs, P(), P()),
        out_specs=out_specs, check_vma=False)(res, idx, valid)


def make_mesh_resident_step(model, cfg: Config, mesh, state,
                            shard_embeddings: bool = False,
                            flat: bool = False) -> Callable:
    """Single sharded resident step (mesh twin of make_resident_step)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clsr_tpu.parallel.embedding import use_sharded_tables
    from clsr_tpu.parallel.mesh import state_sharding
    from clsr_tpu.training.losses import LossParts
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)

    from clsr_tpu.parallel.rowmap import resolve_interleaved

    from clsr_tpu.ops.pallas_attention import use_train_attention_mesh
    raw = make_train_step_fn(model, cfg, allow_pallas=None)
    B = cfg.batch_size
    il = resolve_interleaved(cfg)

    def step(st, res, perm, n_rows, offset, rng):
        with use_sharded_tables(mesh if shard_embeddings else None, flat,
                                il), \
             use_train_attention_mesh(mesh, flat):
            idx = jax.lax.dynamic_slice(perm, (offset,), (B,))
            valid = (offset + jnp.arange(B)) < n_rows
            batch = gather_batch_mesh(mesh, flat, res, idx, valid)
            st, parts = raw(st, batch, rng)
        return sync_params_from_opt(st), parts

    st_shard = state_sharding(state, mesh, shard_embeddings)
    rep = NamedSharding(mesh, P())
    parts_shard = LossParts(loss=rep, data_loss=rep, regular_loss=rep,
                            contrastive_loss=rep, discrepancy_loss=rep)
    return jax.jit(
        step,
        in_shardings=(st_shard, resident_sharding(mesh, flat),
                      rep, rep, rep, rep),
        out_shardings=(st_shard, parts_shard),
        donate_argnums=(0,))


def make_mesh_resident_multi_step(model, cfg: Config, mesh, state,
                                  steps_per_call: int,
                                  shard_embeddings: bool = False,
                                  flat: bool = False) -> Callable:
    """K sharded resident steps per dispatch: the on-device epoch-
    permutation gather (gather_batch_mesh) inside the sharded lax.scan —
    the flagship single-chip configuration (resident gather in the
    K-step scan) carried onto the mesh (VERDICT r2 item 2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clsr_tpu.parallel.embedding import use_sharded_tables
    from clsr_tpu.parallel.mesh import state_sharding
    from clsr_tpu.training.losses import LossParts
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)

    from clsr_tpu.parallel.rowmap import resolve_interleaved

    from clsr_tpu.ops.pallas_attention import use_train_attention_mesh
    raw = make_train_step_fn(model, cfg, allow_pallas=None)
    B = cfg.batch_size
    il = resolve_interleaved(cfg)

    def multi(st, res, perm, n_rows, offset, rng):
        def body(s, k):
            start = offset + k * B
            idx = jax.lax.dynamic_slice(perm, (start,), (B,))
            valid = (start + jnp.arange(B)) < n_rows
            batch = gather_batch_mesh(mesh, flat, res, idx, valid)
            return raw(s, batch, jax.random.fold_in(rng, k))

        with use_sharded_tables(mesh if shard_embeddings else None, flat,
                                il), \
             use_train_attention_mesh(mesh, flat):
            st, parts = jax.lax.scan(body, st,
                                     jnp.arange(steps_per_call))
        return sync_params_from_opt(st), parts

    st_shard = state_sharding(state, mesh, shard_embeddings)
    rep = NamedSharding(mesh, P())
    parts_shard = LossParts(loss=rep, data_loss=rep, regular_loss=rep,
                            contrastive_loss=rep, discrepancy_loss=rep)
    return jax.jit(
        multi,
        in_shardings=(st_shard, resident_sharding(mesh, flat),
                      rep, rep, rep, rep),
        out_shardings=(st_shard, parts_shard),
        donate_argnums=(0,))


def make_resident_bn_refresh(model, cfg: Config) -> Callable:
    """Forward-only BN-stat refresh over resident rows:
    (state, res, idx [B], rng) -> state (only batch_stats changed).
    The length-bucketed epoch calls this over bucket-interleaved random
    row samples before eval (training/steps.py:make_bn_refresh_fn)."""
    from clsr_tpu.training.steps import make_bn_refresh_fn

    raw = make_bn_refresh_fn(model, cfg)

    def step(state, res: ResidentDataset, idx: jnp.ndarray,
             rng: jax.Array):
        batch = gather_batch(res, idx, jnp.ones(idx.shape, bool))
        return raw(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,))


def make_mesh_resident_bn_refresh(model, cfg: Config, mesh, state,
                                  shard_embeddings: bool = False,
                                  flat: bool = False) -> Callable:
    """Mesh twin of make_resident_bn_refresh (sharded gather + forward)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clsr_tpu.parallel.embedding import use_sharded_tables
    from clsr_tpu.parallel.mesh import state_sharding
    from clsr_tpu.parallel.rowmap import resolve_interleaved
    from clsr_tpu.training.steps import make_bn_refresh_fn

    raw = make_bn_refresh_fn(model, cfg)
    il = resolve_interleaved(cfg)

    def step(st, res, idx, rng):
        with use_sharded_tables(mesh if shard_embeddings else None, flat,
                                il):
            batch = gather_batch_mesh(mesh, flat, res, idx,
                                      jnp.ones(idx.shape, bool))
            return raw(st, batch, rng)

    st_shard = state_sharding(state, mesh, shard_embeddings)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(st_shard, resident_sharding(mesh, flat), rep, rep),
        out_shardings=st_shard,
        donate_argnums=(0,))


def make_resident_step(model, cfg: Config) -> Callable:
    """Single resident step: (state, res, perm, n_rows, offset, rng).

    sync_params_from_opt at the jit boundary is LOAD-BEARING: under the
    LazyAdam pmn fused-table layout the compact step updates only the
    [N, 3D] param|mu|nu rows in opt_state.moments and leaves the
    params-tree tables stale — without the boundary sync, eval /
    checkpoint / serving silently observe the INITIAL embeddings.
    (Round-5 forensics: every resident-path fit quality-capped at
    frozen-embedding level, -11pt GAUC on the bimodal cell, while the
    loss trajectory — computed in moments space — looked perfectly
    healthy.  The mesh builders always had the sync; these did not.)"""
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)

    raw = make_train_step_fn(model, cfg)
    B = cfg.batch_size

    def step(state, res: ResidentDataset, perm: jnp.ndarray,
             n_rows: jnp.ndarray, offset: jnp.ndarray, rng: jax.Array):
        idx = jax.lax.dynamic_slice(perm, (offset,), (B,))
        valid = (offset + jnp.arange(B)) < n_rows
        batch = gather_batch(res, idx, valid)
        state, parts = raw(state, batch, rng)
        return sync_params_from_opt(state), parts

    return jax.jit(step, donate_argnums=(0,))


def make_resident_multi_step(model, cfg: Config,
                             steps_per_call: int) -> Callable:
    """K resident steps per dispatch.

    multi(state, res, perm, n_rows, offset, rng) -> (state, LossParts[K]).
    `offset` is the flat row offset of the call's first batch; step k uses
    rows [offset + k*B, offset + (k+1)*B).

    The boundary sync_params_from_opt (once per K-step call, a ~15MB
    contiguous slice-copy at Taobao dims — negligible) keeps the
    params-tree tables fresh for eval/checkpoint under the pmn fused
    layout; see make_resident_step for the round-5 staleness bug it
    closes.
    """
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)

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

        state, parts = jax.lax.scan(body, state,
                                    jnp.arange(steps_per_call))
        return sync_params_from_opt(state), parts

    return jax.jit(multi, donate_argnums=(0,))
