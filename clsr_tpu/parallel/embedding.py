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
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_sharded_tables(mesh: Optional[Mesh]):
    """Route table lookups through collective gathers while tracing."""
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def _local_masked_gather(table_shard: jnp.ndarray, ids: jnp.ndarray
                         ) -> jnp.ndarray:
    """Gather rows this shard owns; zeros elsewhere; psum over 'model'."""
    rows = table_shard.shape[0]
    lo = jax.lax.axis_index("model") * rows
    loc = ids - lo
    ok = (loc >= 0) & (loc < rows)
    vals = table_shard[jnp.clip(loc, 0, rows - 1)]
    vals = vals * ok[..., None].astype(vals.dtype)
    return jax.lax.psum(vals, "model")


def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] with ids batch-leading (sharded over 'data' on a mesh).

    ids may be any shape with a leading batch axis; returns
    ids.shape + (D,).
    """
    mesh = active_mesh()
    if mesh is None or table.shape[0] % mesh.shape["model"] != 0:
        return table[ids]   # replicated table (or single device)

    flat = ids.reshape(ids.shape[0], -1)

    out = jax.shard_map(
        _local_masked_gather, mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
    )(table, flat)
    return out.reshape(ids.shape + (table.shape[1],))


def gather_rows_replicated(table: jnp.ndarray, ids: jnp.ndarray
                           ) -> jnp.ndarray:
    """table[ids] for REPLICATED id vectors (the lazy-L2/discrepancy
    bookkeeping paths, where ids were globally sorted)."""
    mesh = active_mesh()
    if mesh is None or table.shape[0] % mesh.shape["model"] != 0:
        return table[ids]

    out = jax.shard_map(
        _local_masked_gather, mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
    )(table, ids.reshape(-1))
    return out.reshape(ids.shape + (table.shape[1],))
