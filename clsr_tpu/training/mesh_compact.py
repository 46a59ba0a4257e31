"""Compact row engine on the (data, model) mesh (ROADMAP item 8).

The single-device compact engine (training/compact_rows.py) restructures
the step so each embedding table costs ONE sorted HBM gather and ONE
row write — but it sorts the GLOBAL batch's ids, which on a mesh would
force cross-shard resharding of every id/position array.  This module
is the sharded formulation; reference counterparts are the same lookup
and regularization sites (sequential_base_model.py:364-438,
clsr.py:91-127) — the reference is single-device, so the sharding is
TPU-native design, not parity.

Layout: with `d` data shards, every per-table id/position array carries
a leading [d] axis sharded P('data', None, ...) so all plan bookkeeping
(sort, inverse argsort, run detection) stays SHARD-LOCAL:

  * plans:  per-data-shard `compact_rows.build_plan` runs inside a
    `shard_map`; each shard sorts only its own ~M/d ids.
  * global-first mask: the L2 / discrepancy terms must count each
    GLOBALLY unique row once (a row appearing on two data shards would
    otherwise be double-counted).  The per-shard sorted id vectors are
    all-gathered over 'data' (ids only, 4B each) and one replicated
    stable argsort of the [d*M/d] concatenation marks, for every
    occurrence, whether it is the first in shard-major order; each
    shard slices back its own block.  The same permutation (`gperm`)
    and run index (`gseg`) are saved for the update's gradient merge so
    nothing is re-sorted later.
  * w gather: `parallel.embedding.gather_rows` on the [d, M/d] sorted
    ids — each model shard contributes its owned rows, one psum over
    'model' of [1, M/d, 3D] blocks per data shard (NOT a replicated
    [M, 3D] — per-device memory and collective bytes stay O(M/d)).
  * forward lookups: vmapped compact-array gathers over the [d] axis —
    shard-local under GSPMD, VMEM-resident like the single-device path.
  * update (lazy_adam.compact_table_update_mesh): the w-space backward
    lands as [d, M/d, D] per-shard gradients; (ids, grads) are
    all-gathered over 'data' (~M*D*4 bytes, the one real collective),
    every device replays the saved `gperm`/`gseg` merge to get the
    EXACT globally-summed per-unique-row gradient and the EXACT
    global-unique clip norm (this was ROADMAP 8's stated blocker:
    cross-shard dedup for the clip norm — solved by merging on every
    device; ownership only gates the final row writes), and each model
    shard scatter-writes the pmn rows it owns.

Math is identical to the single-device compact/pmn path (same sums up
to float reassociation order, same clip semantics, same pmn fused
[N, 3D] param|mu|nu rows); tests/test_mesh_compact.py asserts one-step
parameter equality and K-step loss tracking against the single-device
engine, plus no-full-table HLO.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from clsr_tpu.data.batch import Batch
from clsr_tpu.parallel.embedding import batch_axes
from clsr_tpu.training.compact_rows import SITE_SPECS, build_plan


@flax.struct.dataclass
class MeshPlan:
    """Per-data-shard sorted-id bookkeeping for one table.

    sorted_ids/gfirst are [d, Mi] sharded P('data', None); pos entries
    are [d, b, ...] sharded P('data', None, ...); gperm/gseg are the
    REPLICATED [d*Mi] global merge permutation / run index shared by
    the L2 mask construction and the update's gradient merge.
    """

    sorted_ids: jnp.ndarray          # [d, Mi] int32, ascending per shard
    gfirst: jnp.ndarray              # [d, Mi] bool: globally-first occurrence
    pos: Dict[str, jnp.ndarray]      # site -> [d, b, ...] positions into Mi
    gperm: jnp.ndarray               # [d*Mi] int32 stable argsort of flat ids
    gseg: jnp.ndarray                # [d*Mi] int32 global run index
    perm: jnp.ndarray                # [d, Mi] per-shard argsort of site ids
    inv: jnp.ndarray                 # [d, Mi] per-shard argsort(perm)
    # static (name, flat offset, per-shard id shape) per site, concat order
    site_slices: tuple = flax.struct.field(pytree_node=False, default=())


@flax.struct.dataclass
class MeshCompactRows:
    """Mesh twin of compact_rows.CompactRows: same site()/stats API so
    model code is engine-agnostic."""

    w: jnp.ndarray                   # [d, Mi, D] per-shard gathered rows
    plan: MeshPlan
    rows: Optional[jnp.ndarray] = None   # [d, Mi, D] per-shard permuted rows

    def site(self, name: str) -> jnp.ndarray:
        """Embedding rows for a lookup site, in original [B, ...] order.

        With `rows` present: a STATIC slice of the one per-shard
        permuted gather (compact_rows.permuted_rows vmapped over the
        shard axis — backward is a gather by perm, no scatter-adds).
        Fallback: a vmapped per-shard gather (each data shard indexes
        its own compact block, shard-local under GSPMD)."""
        d = self.w.shape[0]
        D = self.w.shape[-1]
        if self.rows is not None:
            for s, off, shp in self.plan.site_slices:
                if s == name:
                    n = int(np.prod(shp))
                    vals = self.rows[:, off:off + n]           # [d, n, D]
                    return vals.reshape((d * shp[0],) + shp[1:] + (D,))
        pos = self.plan.pos[name]                    # [d, b, ...]
        flat = pos.reshape(d, -1)
        vals = jax.vmap(lambda wk, pk: wk[pk])(self.w, flat)   # [d, n, D]
        out_shape = ((pos.shape[0] * pos.shape[1],) + pos.shape[2:]
                     + (self.w.shape[-1],))
        return vals.reshape(out_shape)

    def sumsq_unique(self) -> jnp.ndarray:
        """sum ||row||^2 over GLOBALLY unique involved rows (the lazy L2
        term, sequential_base_model.py:409-433) — gfirst counts each
        unique row on exactly one shard; the scalar reduce sums over
        shards (GSPMD inserts the psum)."""
        w32 = self.w.astype(jnp.float32)
        ff = self.plan.gfirst.astype(jnp.float32)[..., None]
        return jnp.sum(w32 * w32 * ff)

    def pair_stats(self, other: "MeshCompactRows"):
        """(sumsq_self, sumsq_other, sum||a-b||^2, n_unique*D) over
        globally unique rows — CLSR's involved-user L2 + discrepancy
        stats (clsr.py:73-82,118-127).  Both tables share the plan."""
        wa = self.w.astype(jnp.float32)
        wb = other.w.astype(jnp.float32)
        ff = self.plan.gfirst.astype(jnp.float32)[..., None]
        sumsq_a = jnp.sum(wa * wa * ff)
        sumsq_b = jnp.sum(wb * wb * ff)
        diff = wa - wb
        sumsq_diff = jnp.sum(diff * diff * ff)
        n_elems = (jnp.sum(self.plan.gfirst.astype(jnp.float32))
                   * wa.shape[-1])
        return sumsq_a, sumsq_b, sumsq_diff, n_elems


def _stack_shardwise(sites: Dict[str, jnp.ndarray], d: int
                     ) -> Dict[str, jnp.ndarray]:
    """[B, ...] -> [d, B/d, ...]: leading batch axis split into (shard,
    local-row) so per-shard plan work never crosses the 'data' axis."""
    out = {}
    for s, ids in sites.items():
        b = ids.shape[0]
        if b % d != 0:
            raise ValueError(
                f"batch axis {b} not divisible by data shards {d}")
        out[s] = ids.reshape((d, b // d) + ids.shape[1:])
    return out


def build_mesh_plan(mesh: Mesh, sites: Dict[str, jnp.ndarray],
                    flat: bool = False) -> MeshPlan:
    """flat=True: the batch (and the plan's leading axis) is sharded
    over BOTH mesh axes (d*m shards, data-major device order — matches
    P(('data','model')) block assignment)."""
    axes = batch_axes(flat)
    d = int(np.prod([mesh.shape[a] for a in axes]))
    stacked = _stack_shardwise(sites, d)
    site_names = list(stacked.keys())

    def local(blocks):
        squeezed = {s: blocks[s][0] for s in site_names}
        plan = build_plan(squeezed)
        # ids-only collective: [d, Mi] int32
        ids_all = jax.lax.all_gather(plan.sorted_ids, axes)
        flat = ids_all.reshape(-1)
        gperm = jnp.argsort(flat)            # stable: shard-major ties
        s_sorted = flat[gperm]
        firstg = jnp.concatenate(
            [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]])
        gseg = jnp.cumsum(firstg.astype(jnp.int32)) - 1
        inv = jnp.argsort(gperm)
        gfirst_flat = firstg[inv]            # back to shard-major layout
        k = jax.lax.axis_index(axes)
        mi = plan.sorted_ids.shape[0]
        gfirst = jax.lax.dynamic_slice(gfirst_flat, (k * mi,), (mi,))
        return (plan.sorted_ids[None], gfirst[None],
                {s: plan.pos[s][None] for s in site_names},
                gperm.astype(jnp.int32), gseg,
                plan.perm[None], plan.inv[None])

    ax = axes if flat else "data"
    in_specs = ({s: P(ax, *([None] * (v.ndim - 1)))
                 for s, v in stacked.items()},)
    out_specs = (P(ax, None), P(ax, None),
                 {s: P(ax, *([None] * (stacked[s].ndim - 1)))
                  for s in site_names},
                 P(), P(), P(ax, None), P(ax, None))
    # check_vma off: gperm/gseg are replicated outputs derived from the
    # all_gather — data-invariant by construction, but the checker
    # cannot infer that through the argsorts
    sorted_ids, gfirst, pos, gperm, gseg, perm, inv = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(stacked)
    slices = []
    off = 0
    for s in site_names:
        shp = tuple(int(x) for x in stacked[s].shape[1:])
        slices.append((s, off, shp))
        off += int(np.prod(shp))
    return MeshPlan(sorted_ids=sorted_ids, gfirst=gfirst, pos=pos,
                    gperm=gperm, gseg=gseg, perm=perm, inv=inv,
                    site_slices=tuple(slices))


def build_mesh_plans(mesh: Mesh, table_names: Dict[Any, str], batch: Batch,
                     flat: bool = False) -> Dict[str, MeshPlan]:
    """One plan per table name (compact_rows.build_plans, mesh form)."""
    return {name: build_mesh_plan(mesh, SITE_SPECS[name](batch), flat)
            for name in set(table_names.values())}


def gather_mesh_ws(tables: Dict[Any, jnp.ndarray],
                   table_names: Dict[Any, str],
                   plans: Dict[str, MeshPlan]) -> Dict[str, jnp.ndarray]:
    """The one collective row gather per table: [d, Mi] sorted ids
    against the P('model', None) pmn array via the explicit shard_map
    engine (parallel/embedding.gather_rows) -> [d, Mi, 3D] sharded
    P('data', None, None).  Tables whose row count doesn't divide the
    model axis are replicated and gather shard-locally."""
    from clsr_tpu.parallel.embedding import gather_rows

    return {table_names[path]:
            gather_rows(table, plans[table_names[path]].sorted_ids)
            for path, table in tables.items()}


def make_mesh_context(plans: Dict[str, MeshPlan],
                      ws: Dict[str, jnp.ndarray]
                      ) -> Dict[str, MeshCompactRows]:
    from clsr_tpu.training.compact_rows import permuted_rows

    return {name: MeshCompactRows(
        w=ws[name], plan=plans[name],
        rows=jax.vmap(permuted_rows)(ws[name], plans[name].inv,
                                     plans[name].perm))
            for name in ws}
