"""Explicit collective lookup for row-sharded embedding tables.

The reference holds its 5 embedding tables as single-device dense
variables (sequential_base_model.py:364-379, clsr.py:91-101).  The
TPU-native engine row-shards them over the mesh's `model` axis — but
round-1 relied on whatever GSPMD emitted for `table[ids]` against a
P('model', None) table, and HLO inspection showed GSPMD ALL-GATHERS the
full table per step (VERDICT r1).  At Kuaishou scale (500k x 32 x 5
tables) that forfeits the entire benefit of sharding.

This module makes the collective pattern explicit via `shard_map`:

  lookup:  each model shard gathers its local rows (out-of-range ids are
           masked to zero) and the per-shard partial results are summed
           with `psum` over `model` — one [B*, D] collective instead of a
           full-table all-gather.  The backward pass (shard_map
           transpose) scatter-adds each shard's own rows only, with the
           data-axis gradient psum inserted automatically.

  update:  LazyAdam's row update runs shard-locally (lazy_adam.py):
           touched ids are all-gathered over `data` (4B/id — cheap),
           each shard updates the rows it owns, no table-sized
           collective at all.

Activation: the sharded step builders (parallel/mesh.py) wrap tracing in
`use_sharded_tables(mesh)`; model code calls `gather_rows` /
`gather_rows_replicated`, which fall back to plain indexing when no mesh
context is active (single-device path unchanged).

FLAT BATCH MODE (`use_sharded_tables(mesh, flat_batch=True)`, config
`mesh_flat_batch`): the batch is sharded over BOTH mesh axes — flat
data parallelism over d*m devices.  The replicated-batch formulation
wastes the model axis on the dense towers (every model shard redoes
the same scans/attention/MLPs) and psums full-width mostly-zero
lookup results; in flat mode the dense compute splits d*m ways and the
lookup becomes the DLRM-style exchange expressed with TPU collectives:
all-gather the (tiny, int32) id blocks over 'model', each shard
gathers its owned rows for all m blocks, and ONE psum_scatter returns
each device exactly its own block's rows — ~half the collective bytes
at 1/m the per-device id count (SURVEY §2.4's all-to-all lookup, in
reduce-scatter form).  Tables stay P('model', None); the row-update
merges all-gather (ids, grads) over both axes (lazy_adam /
mesh_compact).  Differential-equal to the single-device engine
(tests/test_mesh_compact.py).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def active_flat_batch() -> bool:
    """True when the batch is sharded over BOTH mesh axes (flat data
    parallelism over d*m devices; tables stay row-sharded on 'model')."""
    return bool(getattr(_state, "flat", False))


def active_row_interleaved() -> bool:
    """True when model-sharded tables use the interleaved physical row
    layout (parallel/rowmap.py): owner = id % m, local = id // m."""
    return bool(getattr(_state, "interleaved", False))


def batch_axes(flat: bool):
    return ("data", "model") if flat else ("data",)


@contextlib.contextmanager
def use_sharded_tables(mesh: Optional[Mesh], flat_batch: bool = False,
                       interleaved: bool = False):
    """Route table lookups through collective gathers while tracing.
    `interleaved` selects the physical row layout the placed tables use
    (must match place_state — parallel/rowmap.py)."""
    prev = getattr(_state, "mesh", None)
    prev_flat = getattr(_state, "flat", False)
    prev_il = getattr(_state, "interleaved", False)
    _state.mesh = mesh
    _state.flat = flat_batch if mesh is not None else False
    _state.interleaved = interleaved if mesh is not None else False
    try:
        yield
    finally:
        _state.mesh = prev
        _state.flat = prev_flat
        _state.interleaved = prev_il


def _owned_rows_mask(table_shard: jnp.ndarray, ids: jnp.ndarray, m: int,
                     interleaved: bool):
    """(local rows, owned-here mask) for logical ids against this
    shard's [rows, D] block under either physical layout
    (parallel/rowmap.py)."""
    from clsr_tpu.parallel.rowmap import owner_local

    rows = table_shard.shape[0]
    j = jax.lax.axis_index("model")
    owner, loc = owner_local(ids, m, rows, interleaved)
    ok = (owner == j) & (ids >= 0) & (ids < m * rows)
    return jnp.clip(loc, 0, rows - 1), ok


def _local_masked_gather(table_shard: jnp.ndarray, ids: jnp.ndarray,
                         m: int = 1, interleaved: bool = False
                         ) -> jnp.ndarray:
    """Gather rows this shard owns; zeros elsewhere; psum over 'model'."""
    loc, ok = _owned_rows_mask(table_shard, ids, m, interleaved)
    vals = table_shard[loc]
    vals = vals * ok[..., None].astype(vals.dtype)
    return jax.lax.psum(vals, "model")


def _local_gather_flat(table_shard: jnp.ndarray, ids: jnp.ndarray,
                       m: int = 1, interleaved: bool = False
                       ) -> jnp.ndarray:
    """Flat-batch lookup: each device's ids are DISTINCT (batch sharded
    over both axes), so instead of psum'ing full-width masked results,
    the m model peers exchange id blocks (all_gather over 'model' —
    4B/id), each gathers its owned rows for ALL m blocks, and one
    psum_scatter returns each device exactly its own block's rows —
    ~half the collective bytes of the replicated-batch psum AND 1/m the
    ids per device (the DLRM-style all-to-all exchange, SURVEY §2.4,
    expressed as all-gather-ids + reduce-scatter-rows)."""
    ids_all = jax.lax.all_gather(ids, "model")          # [m, b_loc, n]
    loc, ok = _owned_rows_mask(table_shard, ids_all, m, interleaved)
    vals = table_shard[loc]                             # [m, b_loc, n, D]
    vals = vals * ok[..., None].astype(vals.dtype)
    return jax.lax.psum_scatter(vals, "model", scatter_dimension=0,
                                tiled=False)            # [b_loc, n, D]


def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] with ids batch-leading (sharded over the mesh's batch
    axes).

    ids may be any shape with a leading batch axis; returns
    ids.shape + (D,).
    """
    mesh = active_mesh()
    if mesh is None or table.shape[0] % mesh.shape["model"] != 0:
        return table[ids]   # replicated table (or single device)

    m = mesh.shape["model"]
    il = active_row_interleaved()
    flat_ids = ids.reshape(ids.shape[0], -1)
    if active_flat_batch():
        out = jax.shard_map(
            functools.partial(_local_gather_flat, m=m, interleaved=il),
            mesh=mesh,
            in_specs=(P("model", None), P(("data", "model"), None)),
            out_specs=P(("data", "model"), None, None),
        )(table, flat_ids)
    else:
        out = jax.shard_map(
            functools.partial(_local_masked_gather, m=m, interleaved=il),
            mesh=mesh,
            in_specs=(P("model", None), P("data", None)),
            out_specs=P("data", None, None),
        )(table, flat_ids)
    return out.reshape(ids.shape + (table.shape[1],))


def gather_rows_replicated(table: jnp.ndarray, ids: jnp.ndarray
                           ) -> jnp.ndarray:
    """table[ids] for REPLICATED id vectors (the lazy-L2/discrepancy
    bookkeeping paths, where ids were globally sorted)."""
    mesh = active_mesh()
    if mesh is None or table.shape[0] % mesh.shape["model"] != 0:
        return table[ids]

    out = jax.shard_map(
        functools.partial(_local_masked_gather, m=mesh.shape["model"],
                          interleaved=active_row_interleaved()),
        mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
    )(table, ids.reshape(-1))
    return out.reshape(ids.shape + (table.shape[1],))
