"""Compact row engine: one sorted gather per embedding table per step.

The reference materializes a dense [N, D] gradient for every embedding
table (TF1 IndexedSlices densified by the LazyAdam apply,
base_model.py:275-276; lookups at sequential_base_model.py:364-438,
clsr.py:91-101) and the round-1 port mirrored that: per table per step
it issued ~6 HBM gathers (forward hist/target lookups, the involved-row
L2 re-gather, LazyAdam's grad/param/moment row gathers) and ~5 HBM
scatters (XLA scatter-adds for each lookup site's backward plus 3
scatter-sets in the update).  The row-op cost model
(docs/RESULTS_r2.md) shows each of those costs 1-2ms once a table
spills out of VMEM (43-85ns/row at 500k rows), so the step is
row-access-bound at production dims.

The compact engine restructures the step so each table is touched by
exactly ONE sorted HBM gather and ONE sorted+unique scatter-set (plus
one gather + one set for the fused [N, 2D] Adam moment array —
lazy_adam.LazyAdamState stores mu|nu side by side because HBM row cost
is set by row count, not payload width):

  1. all batch ids that can touch a table are concatenated and
     argsorted (cheap: 22us for 25.6k int32); the inverse permutation
     gives every lookup site its position array into the sorted ids;
  2. w = table[sorted_ids] is gathered ONCE (indices_are_sorted hint)
     and passed to the loss as a differentiable input; forward lookups
     index the VMEM-sized compact w (1.8ns/row) instead of the HBM
     table, and the involved-row L2 / discrepancy terms are computed
     from w with a first-occurrence mask — no second gather;
  3. the backward lands in compact space (dL/dw, [M, D]); duplicate
     occurrences are summed with a segment_sum over the sorted runs
     (215us, vs a 2.2ms HBM scatter-add per lookup site);
  4. the LazyAdam row update reads old param rows from w (free),
     gathers the two moment tables once, and writes param/mu/nu with
     sorted+unique scatter-sets (40% cheaper than unhinted scatters).

The math is identical to training/lazy_adam.py's legacy path (same
sums, same clip-by-unique-row-norm, same bias correction); differential
tests assert one-step equality.  Active when optimizer=lazyadam, no
mesh is tracing (the sharded path keeps the explicit collective engine,
parallel/embedding.py), and every *_embedding param has a known site
spec below.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Dict, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from clsr_tpu.data.batch import Batch

_state = threading.local()

# Which batch id arrays can touch each known table (trace-order sites).
SITE_SPECS = {
    "item_embedding": lambda b: {"hist": b.item_hist, "targets": b.items},
    "cate_embedding": lambda b: {"hist": b.cate_hist, "targets": b.cates},
    "user_embedding": lambda b: {"rows": b.users},
    "user_long_embedding": lambda b: {"rows": b.users},
    "user_short_embedding": lambda b: {"rows": b.users},
}


@flax.struct.dataclass
class Plan:
    """Sorted-id bookkeeping for one table (all non-differentiable)."""

    sorted_ids: jnp.ndarray          # [M] int32 ascending
    seg: jnp.ndarray                 # [M] int32 run index (cumsum(first)-1)
    first: jnp.ndarray               # [M] bool first-occurrence mask
    idx_first: jnp.ndarray           # [M] int32 first occurrence per run
    pos: Dict[str, jnp.ndarray]      # site -> positions into sorted_ids
    perm: jnp.ndarray                # [M] int32 argsort of concat site ids
    inv: jnp.ndarray                 # [M] int32 argsort(perm)
    # static (name, flat offset, id shape) per site, in concat order
    site_slices: Tuple[Tuple[str, int, Tuple[int, ...]], ...] = \
        flax.struct.field(pytree_node=False, default=())


@jax.custom_vjp
def permuted_rows(w: jnp.ndarray, inv: jnp.ndarray,
                  perm: jnp.ndarray) -> jnp.ndarray:
    """rows = w[inv] with a GATHER backward.

    `inv` is a permutation of range(M) (the inverse argsort of the
    concatenated site ids), so rows[i] == table[flat_ids[i]] — the
    concatenation of every site lookup in original order.  Because it is
    a permutation, each w row receives exactly ONE cotangent row, so the
    backward is dL/dw = g[perm] — a pure gather.  Without this VJP, XLA
    differentiates each per-site `w[pos]` into a scatter-add into a
    zeros[M, D] (one per lookup site: 5-7 per step across the tables,
    a few hundred us each at production dims, docs/RESULTS_r2.md row-op
    cost model); the gather costs ~5x less than the scatter-add.
    Bit-identical values and gradients (indices are disjoint, so even
    the scatter-adds had no summation collisions to reassociate).

    Limitation: custom_vjp makes this reverse-mode only — jvp/jacfwd
    through the compact loss will raise.  If forward-mode is ever
    needed, swap in a custom_jvp (the JVP is simply t[inv])."""
    return w.at[inv].get(unique_indices=True)


def _permuted_rows_fwd(w, inv, perm):
    return w.at[inv].get(unique_indices=True), perm


def _permuted_rows_bwd(perm, g):
    return g.at[perm].get(unique_indices=True), None, None


permuted_rows.defvjp(_permuted_rows_fwd, _permuted_rows_bwd)


@flax.struct.dataclass
class CompactRows:
    """A table's gathered rows + plan, visible to the model while tracing."""

    w: jnp.ndarray                   # [M, D] = table[sorted_ids]
    plan: Plan
    rows: Optional[jnp.ndarray] = None   # [M, D] permuted_rows(w) — every
    #                                      site lookup concatenated in
    #                                      original order (gather backward)

    def site(self, name: str) -> jnp.ndarray:
        """Embedding rows for a lookup site, in original order/shape.

        With `rows` present this is a STATIC slice of the one permuted
        gather (backward: concat of zero-padded slices, then one gather
        by `perm` — no scatter-adds); otherwise the per-site gather."""
        if self.rows is not None:
            for s, off, shape in self.plan.site_slices:
                if s == name:
                    n = int(np.prod(shape))
                    return self.rows[off:off + n].reshape(
                        shape + (self.rows.shape[-1],))
            if self.plan.site_slices:
                # rows is set but the site is unknown to the plan: a
                # plan/rows construction mismatch, not a lookup to hide
                raise KeyError(
                    f"site {name!r} missing from plan.site_slices "
                    f"{[s for s, _, _ in self.plan.site_slices]}")
        return self.w[self.pos(name)]

    def pos(self, name: str) -> jnp.ndarray:
        return self.plan.pos[name]

    def sumsq_unique(self) -> jnp.ndarray:
        """sum ||row||^2 over UNIQUE involved rows (the lazy L2 term,
        sequential_base_model.py:409-433)."""
        w32 = self.w.astype(jnp.float32)
        return jnp.sum(jnp.sum(w32 * w32, axis=-1)
                       * self.plan.first.astype(jnp.float32))

    def pair_stats(self, other: "CompactRows"):
        """(sumsq_self, sumsq_other, sum||a-b||^2, n_unique*D) over
        unique rows — CLSR's involved-user L2 + discrepancy stats
        (clsr.py:73-82,118-127).  Both tables share the plan (same id
        source), so the stats come straight from the gathered rows.
        Same API as mesh_compact.MeshCompactRows.pair_stats."""
        wa = self.w.astype(jnp.float32)
        wb = other.w.astype(jnp.float32)
        ff = self.plan.first.astype(jnp.float32)[:, None]
        sumsq_a = jnp.sum(wa * wa * ff)
        sumsq_b = jnp.sum(wb * wb * ff)
        diff = wa - wb
        sumsq_diff = jnp.sum(diff * diff * ff)
        n_elems = jnp.sum(ff) * wa.shape[1]
        return sumsq_a, sumsq_b, sumsq_diff, n_elems


def active_compact() -> Optional[Dict[str, CompactRows]]:
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def use_compact_rows(ctx: Dict[str, CompactRows]):
    prev = getattr(_state, "ctx", None)
    _state.ctx = ctx
    try:
        yield
    finally:
        _state.ctx = prev


def supported_tables(params) -> Optional[Dict[Any, str]]:
    """{path: table_name} if every *_embedding param has a site spec,
    else None (the step falls back to the legacy path — e.g. NCF's
    gmf/mlp tables or LGN's dense-gradient graph tables)."""
    flat = flax.traverse_util.flatten_dict(params)
    tables = {}
    for path in flat:
        name = str(path[-1])
        if name.endswith("_embedding"):
            if name not in SITE_SPECS:
                return None
            tables[path] = name
    return tables if tables else None


def build_plan(sites: Dict[str, jnp.ndarray]) -> Plan:
    """Sort the concatenated site ids; positions via inverse argsort
    (never jnp.searchsorted — pathological on TPU, docs/RESULTS_r2.md)."""
    shapes = {s: ids.shape for s, ids in sites.items()}
    flat = jnp.concatenate([ids.reshape(-1) for ids in sites.values()])
    M = flat.shape[0]
    perm = jnp.argsort(flat)
    sorted_ids = flat[perm]
    inv = jnp.argsort(perm)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    idx_first = jax.ops.segment_min(
        jnp.arange(M, dtype=jnp.int32), seg, num_segments=M,
        indices_are_sorted=True)
    pos = {}
    slices = []
    off = 0
    for s, ids in sites.items():
        n = ids.size
        pos[s] = inv[off:off + n].reshape(shapes[s])
        slices.append((s, off, tuple(int(x) for x in shapes[s])))
        off += n
    return Plan(sorted_ids=sorted_ids, seg=seg, first=first,
                idx_first=idx_first, pos=pos, perm=perm.astype(jnp.int32),
                inv=inv.astype(jnp.int32), site_slices=tuple(slices))


def build_plans(table_names: Dict[Any, str], batch: Batch
                ) -> Dict[str, Plan]:
    """One plan per table name.  Tables indexed by the same id source
    (CLSR's user long/short pair) produce identical plans; XLA CSE
    collapses the duplicate sort work."""
    return {name: build_plan(SITE_SPECS[name](batch))
            for name in set(table_names.values())}


def gather_ws(tables: Dict[Any, jnp.ndarray],
              table_names: Dict[Any, str],
              plans: Dict[str, Plan]) -> Dict[str, jnp.ndarray]:
    """The one sorted HBM gather per table."""
    return {table_names[path]:
            table.at[plans[table_names[path]].sorted_ids]
            .get(indices_are_sorted=True)
            for path, table in tables.items()}


def make_context(plans: Dict[str, Plan],
                 ws: Dict[str, jnp.ndarray]) -> Dict[str, CompactRows]:
    return {name: CompactRows(
        w=ws[name], plan=plans[name],
        rows=permuted_rows(ws[name], plans[name].inv, plans[name].perm))
            for name in ws}
