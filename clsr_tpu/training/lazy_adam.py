"""Lazy (sparse) Adam for embedding tables.

The reference offers `optimizer: lazyadam` (base_model.py:275-276,
tf.contrib.opt.LazyAdamOptimizer): Adam moments are updated ONLY for the
embedding rows touched by the batch.  Dense Adam reads and writes every
table row every step — for production-scale tables that is hundreds of MB
of HBM traffic per step for rows whose gradient is exactly zero.

Here the touched row ids are known to the train step (they come straight
from the batch), so the table update gathers p/m/v/g at those ids, applies
the Adam math, and scatters back — O(touched rows), not O(table size):

  * duplicate ids are harmless: duplicates compute identical new row
    values and `.at[].set` writes are idempotent;
  * per-tensor clip-by-norm uses the norm over UNIQUE rows (the dense
    tensor is zero elsewhere), via a sort-dedup mask;
  * bias correction uses the global step count, like TF's LazyAdam.

Dense (non-table) parameters keep the flattened-Adam path.  Not valid for
models whose table gradients are dense (LGN's graph convolution touches
every row) — config validation rejects that combination.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import optax

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch


def is_table(path_names) -> bool:
    return str(path_names[-1]).endswith("_embedding")


def batch_table_ids(batch: Batch) -> Dict[str, jnp.ndarray]:
    """Row ids each known embedding table can be touched by."""
    items = jnp.concatenate(
        [batch.item_hist.reshape(-1), batch.items.reshape(-1)])
    cates = jnp.concatenate(
        [batch.cate_hist.reshape(-1), batch.cates.reshape(-1)])
    return {
        "item_embedding": items,
        "cate_embedding": cates,
        "user_embedding": batch.users,
        "user_long_embedding": batch.users,
        "user_short_embedding": batch.users,
        "user_gmf_embedding": batch.users,
        "user_mlp_embedding": batch.users,
        "item_gmf_embedding": batch.items.reshape(-1),
        "item_mlp_embedding": batch.items.reshape(-1),
    }


class LazyAdamState(flax.struct.PyTreeNode):
    # Per-table optimizer rows, one fused f32 array per [N, D] table.
    # Fused because HBM row-access cost is set by the table's ROW COUNT,
    # not the row payload (docs/RESULTS_r2.md row-op cost model — XLA
    # lane-pads [N, 40] rows to 128 lanes in HBM anyway, so wider rows
    # are free until 128 lanes):
    #   * split layout  [N, 2D]: mu = [:, :D], nu = [:, D:] — used on
    #     mesh / per-position / unsupported-table configs;
    #   * pmn layout    [N, 3D]: param|mu|nu — the compact row engine's
    #     resident fused tables: the forward's one sorted gather brings
    #     the Adam moments along at zero extra row cost and the whole
    #     update writes ONE scatter-set; `state.params` tables are then
    #     a synced VIEW refreshed at step/scan boundaries
    #     (steps.sync_params_from_opt).
    # Consumers detect the layout from the array width (2D vs 3D).
    moments: Any
    count: jnp.ndarray
    dense_opt: Any
    # cumulative count of (source, owner) bucket entries that exceeded
    # mesh_owner_capacity in the owner-routed mesh merge
    # (mesh_update_routing='owner'); stays 0 on every other path.  With
    # mesh_owner_overflow='fallback' (default) the affected steps take
    # the exact broadcast merge instead — the counter is pure capacity-
    # tuning telemetry; with 'drop' the counted entries' gradients were
    # dropped.  The trainer reads it once per epoch and warns.
    # NOTE: adding this leaf changed the checkpointed state tree —
    # checkpoints saved before round 3 need a one-shot migration
    # (insert a zeros[()] int32 leaf); none are kept in this repo.
    route_overflow: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


def is_pmn(param, mn) -> bool:
    """True if `mn` uses the fused param|mu|nu layout for `param`."""
    return mn.shape[1] == 3 * param.shape[1]


def fused_tables_enabled(cfg, params) -> bool:
    """pmn layout applies exactly when the compact row engine will run:
    lazyadam, compact_rows != off, all tables site-mapped.  On a mesh
    the compact path is the sharded formulation (mesh_compact.py): pmn
    arrays are row-sharded P('model', None) like the tables."""
    if cfg.optimizer != "lazyadam":
        return False
    if getattr(cfg, "compact_rows", "auto") == "off":
        return False
    if (getattr(cfg, "model_type", "") == "nextitnet"
            and getattr(cfg, "nextitnet_per_position", False)):
        return False
    from clsr_tpu.training.compact_rows import supported_tables
    return supported_tables(params) is not None


def _split(params):
    flat = flax.traverse_util.flatten_dict(params)
    tables = {p: v for p, v in flat.items() if is_table(p)}
    dense = {p: v for p, v in flat.items() if not is_table(p)}
    return tables, dense


def make_lazy_optimizer(cfg: Config):
    """Returns (init_fn, update_fn).

    init_fn(params) -> LazyAdamState
    update_fn(params, grads, state, table_ids) -> (new_params, new_state)
    """
    from clsr_tpu.training.optimizer import clip_by_norm_each

    dense_tx = optax.flatten(optax.adam(cfg.learning_rate))
    if cfg.is_clip_norm:
        dense_tx = optax.chain(clip_by_norm_each(cfg.max_grad_norm),
                               dense_tx)
    b1, b2, eps = 0.9, 0.999, 1e-8
    lr = cfg.learning_rate
    max_norm = cfg.max_grad_norm if cfg.is_clip_norm else 0.0
    # physical row layout of model-sharded tables (parallel/rowmap.py):
    # every id -> (owner, local row) mapping below must match the layout
    # place_state used — both resolve from the same cfg
    from clsr_tpu.parallel.rowmap import owner_local, resolve_interleaved
    interleaved = resolve_interleaved(cfg)
    overflow_fallback = (getattr(cfg, "mesh_owner_overflow", "fallback")
                         == "fallback")

    def init_fn(params) -> LazyAdamState:
        tables, dense = _split(params)
        # moments are ALWAYS f32, also for bf16-stored tables
        # (cfg.embedding_dtype='bfloat16'): f32 update math, bf16
        # round-to-nearest store (pmn keeps the bf16-rounded value in
        # its f32 param lane, so gathers recover the bf16 path exactly)
        fused = fused_tables_enabled(cfg, params)

        def init_rows(v):
            if fused:
                return jnp.concatenate(
                    [v.astype(jnp.float32),
                     jnp.zeros((v.shape[0], 2 * v.shape[1]), jnp.float32)],
                    axis=-1)
            return jnp.zeros((v.shape[0], 2 * v.shape[1]), jnp.float32)

        return LazyAdamState(
            moments={p: init_rows(v) for p, v in tables.items()},
            count=jnp.zeros((), jnp.int32),
            dense_opt=dense_tx.init(dense),
            route_overflow=jnp.zeros((), jnp.int32),
        )

    def table_update(param, grad_dense, mn, ids, t):
        D = param.shape[1]
        off = D if is_pmn(param, mn) else 0
        ids = jnp.sort(ids.reshape(-1))
        first = jnp.concatenate(
            [jnp.ones((1,), bool), ids[1:] != ids[:-1]])
        g = grad_dense[ids].astype(jnp.float32)
        if max_norm > 0.0:
            sumsq = jnp.sum(jnp.sum(g * g, -1) * first)
            norm = jnp.sqrt(sumsq)
            g = g * jnp.where(norm > max_norm, max_norm / norm, 1.0)
        mv = mn[ids]                      # one fused moment gather
        m_new = b1 * mv[:, off:off + D] + (1.0 - b1) * g
        v_new = b2 * mv[:, off + D:] + (1.0 - b2) * g * g
        m_hat = m_new / (1.0 - b1 ** t)
        v_hat = v_new / (1.0 - b2 ** t)
        step = lr * m_hat / (jnp.sqrt(v_hat) + eps)
        if off:
            p_old = mv[:, :D]             # pmn: param lane is the master
        else:
            p_old = param[ids].astype(jnp.float32)
        new_rows = (p_old - step).astype(param.dtype)
        parts = ([new_rows.astype(jnp.float32)] if off else []) \
            + [m_new, v_new]
        return (param.at[ids].set(new_rows),
                mn.at[ids].set(jnp.concatenate(parts, axis=-1)))

    def table_update_sharded(mesh, param, grad_dense, mn, ids, t,
                             flat=False):
        """Shard-local row update for a P('model', None) table.

        Touched ids are all-gathered over the batch axes (4B/id); each
        model shard updates only the rows it owns — no table-sized
        collective (the round-1 GSPMD formulation all-gathered the full
        table, VERDICT r1).  Per-tensor clip uses a psum'd global row
        norm so the scale matches the dense path exactly.
        """
        from jax.sharding import PartitionSpec as P

        from clsr_tpu.parallel.embedding import batch_axes

        D = param.shape[1]
        off = D if is_pmn(param, mn) else 0
        axes = batch_axes(flat)

        m_axis = mesh.shape["model"]

        def local(param_s, grad_s, mn_s, ids_l, t):
            ids_g = jax.lax.all_gather(ids_l, axes, tiled=True)
            ids_sorted = jnp.sort(ids_g)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), ids_sorted[1:] != ids_sorted[:-1]])
            rows = param_s.shape[0]
            j = jax.lax.axis_index("model")
            owner, loc = owner_local(ids_sorted, m_axis, rows, interleaved)
            ok = (owner == j) & (ids_sorted >= 0) \
                & (ids_sorted < m_axis * rows)
            locc = jnp.where(ok, jnp.clip(loc, 0, rows - 1), 0)
            g = grad_s[locc].astype(jnp.float32) * ok[:, None]
            if max_norm > 0.0:
                sumsq = jax.lax.psum(
                    jnp.sum(jnp.sum(g * g, -1) * first), "model")
                norm = jnp.sqrt(sumsq)
                g = g * jnp.where(norm > max_norm, max_norm / norm, 1.0)
            mv = mn_s[locc]
            m_new = b1 * mv[:, off:off + D] + (1.0 - b1) * g
            v_new = b2 * mv[:, off + D:] + (1.0 - b2) * g * g
            m_hat = m_new / (1.0 - b1 ** t)
            v_hat = v_new / (1.0 - b2 ** t)
            step = lr * m_hat / (jnp.sqrt(v_hat) + eps)
            p_old = (mv[:, :D] * ok[:, None] if off
                     else param_s[locc].astype(jnp.float32))
            new_rows = (p_old - step).astype(param_s.dtype)
            # rows not owned here scatter to index `rows` -> dropped
            tgt = jnp.where(ok, loc, rows)
            parts = ([new_rows.astype(jnp.float32)] if off else []) \
                + [m_new, v_new]
            return (param_s.at[tgt].set(new_rows, mode="drop"),
                    mn_s.at[tgt].set(
                        jnp.concatenate(parts, axis=-1),
                        mode="drop"))

        # check_vma off: the checker cannot infer that the all_gather'd
        # id vector is data-invariant; this update is not differentiated
        # through, so the transpose-psum machinery the check guards is
        # not needed
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("model", None), P("model", None), P("model", None),
                      P(axes if flat else "data"), P()),
            out_specs=(P("model", None),) * 2,
            check_vma=False,
        )(param, grad_dense, mn, ids.reshape(-1), t)

    def compact_table_update(param, w, gw, mn, plan, t):
        """Row update from COMPACT w-space gradients (compact_rows.py).

        Same math as table_update: duplicate-occurrence grads are summed
        (segment_sum over sorted runs instead of XLA's dense scatter-add),
        clip uses the norm over unique rows, and the writes are
        sorted+unique scatter-sets.

        Split layout: `w` is the [M, D] forward gather; old param rows
        come from it (no re-gather), moments cost one [N, 2D] gather.
        pmn layout: `w` is the [M, 3D] param|mu|nu gather — moments ride
        the forward gather, the HBM table is touched by ONE scatter-set,
        and `param` is returned untouched (synced at the jit boundary,
        steps.sync_params_from_opt).

        The per-run arrays are statically capped at Mc = min(M, N): a
        table has at most N distinct rows, so runs beyond N cannot
        exist (pigeonhole) — for small-vocab tables hit by long
        histories (Kuaishou cate: N=2k, M=65k) this shrinks the moment
        gather, Adam math and row scatter-set ~30x
        (docs/RESULTS_r3.md "update cap")."""
        N, D = param.shape
        fused = w.shape[1] == 3 * D
        M = plan.sorted_ids.shape[0]
        Mc = min(M, N)      # static: at most N distinct rows can occur
        g = jax.ops.segment_sum(gw.astype(jnp.float32), plan.seg,
                                num_segments=Mc, indices_are_sorted=True)
        nseg = plan.seg[-1] + 1
        valid = jnp.arange(Mc, dtype=jnp.int32) < nseg
        if max_norm > 0.0:
            norm = jnp.sqrt(jnp.sum(g * g))   # rows >= nseg are zero
            g = g * jnp.where(norm > max_norm, max_norm / norm, 1.0)
        # per-run unique id = the id at the run's first row (plan.idx_first
        # already locates it) — a compact gather instead of a segment_max
        sel = jnp.minimum(plan.idx_first[:Mc], M - 1)
        uid = plan.sorted_ids[sel]
        safe = jnp.where(valid, uid, 0)
        vf = valid[:, None].astype(jnp.float32)
        if fused:
            rows_first = w[sel]           # compact-array gather, no HBM
            p_old = rows_first[:, :D]     # f32 master (bf16-rounded)
            mv = rows_first[:, D:] * vf
        else:
            mv = mn[safe] * vf            # one [N, 2D] moment gather
            p_old = w[sel].astype(jnp.float32)
        m_new = b1 * mv[:, :D] + (1.0 - b1) * g
        v_new = b2 * mv[:, D:] + (1.0 - b2) * g * g
        m_hat = m_new / (1.0 - b1 ** t)
        v_hat = v_new / (1.0 - b2 ** t)
        step = lr * m_hat / (jnp.sqrt(v_hat) + eps)
        new_rows = (p_old - step).astype(param.dtype)
        # strictly increasing targets: unique ids on the valid prefix,
        # out-of-range (dropped) tail
        tgt = jnp.where(valid, uid, N + jnp.arange(Mc, dtype=jnp.int32))
        kw = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
        if fused:
            pmn_rows = jnp.concatenate(
                [new_rows.astype(jnp.float32), m_new, v_new], axis=-1)
            return param, mn.at[tgt].set(pmn_rows, **kw)
        return (param.at[tgt].set(new_rows, **kw),
                mn.at[tgt].set(jnp.concatenate([m_new, v_new], axis=-1),
                               **kw))

    def _adam_write_pmn(mn_s, loc, ok, g, t, D):
        """Shared Adam tail of the mesh merges: gather pmn rows at local
        positions `loc` (masked by `ok`), apply the bias-corrected step
        to the f32 master lane, scatter back (not-owned/invalid rows
        drop)."""
        rows = mn_s.shape[0]
        locc = jnp.where(ok, jnp.clip(loc, 0, rows - 1), 0)
        mv = mn_s[locc] * ok[:, None].astype(jnp.float32)
        m_new = b1 * mv[:, D:2 * D] + (1.0 - b1) * g
        v_new = b2 * mv[:, 2 * D:] + (1.0 - b2) * g * g
        m_hat = m_new / (1.0 - b1 ** t)
        v_hat = v_new / (1.0 - b2 ** t)
        step = lr * m_hat / (jnp.sqrt(v_hat) + eps)
        new_rows = mv[:, :D] - step           # f32 pmn master lane
        tgt = jnp.where(ok, loc, rows)        # not owned -> dropped
        pmn_rows = jnp.concatenate([new_rows, m_new, v_new], axis=-1)
        return mn_s.at[tgt].set(pmn_rows, mode="drop")

    def _merge_broadcast_body(mn_s, gw_b0, ids_b0, gperm, gseg, t,
                              N, D, shardable, axes, Mc, m):
        """Shard-local body of the broadcast merge: all-gather the full
        per-step (id, grad) stream over the batch axes, replay the
        plan's saved global sort (gperm/gseg) so the per-unique-row sum
        and the clip norm are the exact single-device semantics, and
        Adam-write the rows this shard owns.  Used by
        compact_table_update_mesh and as the owner-routed merge's
        lossless overflow fallback (mesh_owner_overflow='fallback')."""
        g_all = jax.lax.all_gather(gw_b0, axes)       # [d, Mi, D]
        ids_all = jax.lax.all_gather(ids_b0, axes)    # [d, Mi]
        gflat = g_all.reshape(-1, D).astype(jnp.float32)[gperm]
        uids = ids_all.reshape(-1)[gperm]
        g = jax.ops.segment_sum(gflat, gseg, num_segments=Mc,
                                indices_are_sorted=True)
        nseg = gseg[-1] + 1
        valid = jnp.arange(Mc, dtype=jnp.int32) < nseg
        if max_norm > 0.0:
            norm = jnp.sqrt(jnp.sum(g * g))   # rows >= nseg are zero
            g = g * jnp.where(norm > max_norm, max_norm / norm, 1.0)
        uid = jax.ops.segment_max(uids, gseg, num_segments=Mc,
                                  indices_are_sorted=True)
        safe_uid = jnp.where(valid, uid, 0)
        rows = mn_s.shape[0]
        if shardable:
            j = jax.lax.axis_index("model")
            owner, loc = owner_local(safe_uid, m, rows, interleaved)
            ok = valid & (owner == j)
        else:
            loc = safe_uid
            ok = valid
        return _adam_write_pmn(mn_s, loc, ok, g, t, D)

    def compact_table_update_mesh(mesh, param, gw, mn, plan, t,
                                  flat=False):
        """Mesh-compact row update (training/mesh_compact.py, ROADMAP 8).

        gw is the per-data-shard w-space gradient [d, Mi, D].  The merge
        all-gathers (ids, grads) over 'data' and every device replays
        the plan's saved gperm/gseg sort so the per-unique-row summed
        gradient and the clip norm are computed over the EXACT global
        unique-row set (the single-device semantics) — ownership only
        gates the final pmn row writes, so the result is identical on
        every shard up to which rows it persists.  pmn layout only: one
        scatter-set per table per step; `param` stays a stale view
        (steps.sync_params_from_opt)."""
        from jax.sharding import PartitionSpec as P

        from clsr_tpu.parallel.embedding import batch_axes

        N, D = param.shape
        if not is_pmn(param, mn):
            raise ValueError("mesh-compact requires the pmn fused layout")
        dM = plan.gperm.shape[0]
        Mc = min(dM, N)     # static: at most N distinct rows can occur
        m = mesh.shape["model"]
        shardable = (N % m == 0)
        axes = batch_axes(flat)

        def local(mn_s, gw_b, ids_b, gperm, gseg, t):
            return _merge_broadcast_body(mn_s, gw_b[0], ids_b[0], gperm,
                                         gseg, t, N, D, shardable, axes,
                                         Mc, m)

        mn_spec = P("model", None) if shardable else P()
        ax = axes if flat else "data"
        # check_vma off as in table_update_sharded: the merge inputs are
        # data-invariant after the all_gathers, which the checker cannot
        # infer; this update is not differentiated through
        new_mn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(mn_spec, P(ax, None, None), P(ax, None),
                      P(), P(), P()),
            out_specs=mn_spec,
            check_vma=False,
        )(mn, gw, plan.sorted_ids, plan.gperm, plan.gseg, t)
        return param, new_mn

    def compact_table_update_mesh_owner(mesh, param, gw, mn, plan, t,
                                        flat=False, capacity_factor=4.0):
        """Owner-routed O(M/m) mesh-compact row update (docs/SCALING.md
        "pod-scale refinement", SURVEY §2.4's ragged_all_to_all row).

        The broadcast merge (compact_table_update_mesh) ships the FULL
        per-step (id, grad) stream to every device (~M x (4+4D) bytes
        received) so each can replay the global merge.  Here each device
        instead
          1. merges its own sorted w-space gradients into per-unique
             (uid, gsum) runs (a local segment_sum — no collective);
          2. buckets the runs by owning model shard (owner per the
             physical row layout, parallel/rowmap.py: id % m interleaved
             / id // rows contiguous; ranks via per-owner running
             counts) into STATIC [m, C] buckets,
             C = ceil(capacity_factor * Mi / m) slots (empty slots carry
             a sentinel id = N with zero grad; a runtime-ragged
             all_to_all cannot be static-shaped, so capacity is the
             honest knob — overflow triggers the lossless broadcast
             fallback below, or drops under mesh_owner_overflow='drop');
          3. flat mode: one all_to_all over 'model' delivers each column
             only its owned buckets; non-flat mode the per-column select
             is local (streams are replicated over 'model');
          4. one all_gather over 'data' collects the owned buckets from
             the other batch shards (~d*m*C x (4+4D) bytes = O(M/m) at
             C ~ Mi/m, vs the broadcast's O(M));
          5. one local merge (argsort + segment_sum; sentinels sort
             last) yields the EXACT globally-summed per-unique-row
             gradient for this column's owned rows, and the per-tensor
             clip norm is recovered exactly as a psum over 'model' of
             the per-owner partial sums (ownership partitions the
             unique-id set, so the partials are disjoint).

        Identical math to the broadcast merge up to float reassociation
        order — differential-tested in tests/test_owner_routing.py.

        Overflow is LOSSLESS by default (mesh_owner_overflow=
        'fallback'): the psum'd overflow count is uniform across
        devices, so a lax.cond can route the WHOLE table update through
        the exact broadcast merge on any step where a bucket would
        overflow — the counter (LazyAdamState.route_overflow) becomes
        pure telemetry for capacity tuning.  'drop' keeps the round-3
        semantics (overflowed entries dropped that step) and a compiled
        program with no full-stream collective anywhere.

        Ownership skew: with the default interleaved row layout
        (cfg.mesh_row_layout='auto' + owner routing, parallel/rowmap.py)
        owner = id % m, so CLSR's frequency-ordered vocabs spread their
        hot rows across ALL shards (near-uniform buckets, measured in
        scripts/owner_occupancy.py); the contiguous layout's structural
        shard-0 hotspot (VERDICT r3 weak #4) only exists with
        mesh_row_layout='contiguous'.  pmn layout only.
        """
        from jax.sharding import PartitionSpec as P

        from clsr_tpu.parallel.embedding import batch_axes

        N, D = param.shape
        if not is_pmn(param, mn):
            raise ValueError("owner routing requires the pmn fused layout")
        m = mesh.shape["model"]
        if N % m != 0:
            raise ValueError("owner routing requires a shardable table")
        rows = N // m
        Mi = int(plan.sorted_ids.shape[1])
        C = max(1, min(Mi, -(-int(capacity_factor * Mi) // m)))
        axes = batch_axes(flat)
        dM = plan.gperm.shape[0]
        Mc_b = min(dM, N)   # fallback (broadcast) merge's segment cap

        def local(mn_s, gw_b, ids_b, gperm, gseg, t):
            ids = ids_b[0]                        # [Mi] sorted ascending
            g0 = gw_b[0].astype(jnp.float32)      # [Mi, D]
            # 1. local per-unique merge over the sorted runs
            first = jnp.concatenate(
                [jnp.ones((1,), bool), ids[1:] != ids[:-1]])
            seg = jnp.cumsum(first.astype(jnp.int32)) - 1
            gsum = jax.ops.segment_sum(g0, seg, num_segments=Mi,
                                       indices_are_sorted=True)
            nrun = seg[-1] + 1
            run_ok = jnp.arange(Mi, dtype=jnp.int32) < nrun
            uid = jax.ops.segment_max(ids, seg, num_segments=Mi,
                                      indices_are_sorted=True)
            uid = jnp.where(run_ok, uid, N)       # sentinel for empty runs
            # 2. bucket runs by owning shard.  The owner function follows
            #    the physical row layout (parallel/rowmap.py): interleaved
            #    visits owners round-robin in uid order, so bucket ranks
            #    are per-owner running counts (a [Mi, m] one-hot cumsum —
            #    owner-contiguity is not assumed; identical ranks for the
            #    contiguous layout, where runs ARE owner-sorted)
            owner, _ = owner_local(uid, m, rows, interleaved)
            owner = jnp.clip(owner, 0, m - 1)     # sentinel uid=N safe
            oh = ((owner[:, None] == jnp.arange(m, dtype=jnp.int32)[None])
                  & run_ok[:, None])
            cum = jnp.cumsum(oh.astype(jnp.int32), axis=0)
            rank = jnp.take_along_axis(cum, owner[:, None], axis=1)[:, 0] - 1
            in_cap = rank < C
            send_ok = run_ok & in_cap
            tgt = jnp.where(send_ok, owner * C + rank, m * C)
            send_ids = jnp.full((m * C,), N, jnp.int32).at[tgt].set(
                jnp.where(send_ok, uid, N), mode="drop")
            send_g = jnp.zeros((m * C, D), jnp.float32).at[tgt].set(
                gsum * send_ok[:, None], mode="drop")
            j = jax.lax.axis_index("model")
            if flat:
                # every device's stream is distinct: count all drops here
                ovf = jnp.sum((run_ok & ~in_cap).astype(jnp.int32))
            else:
                # streams are replicated over 'model': count each drop
                # once, at its owner's column
                ovf = jnp.sum(
                    (run_ok & ~in_cap & (owner == j)).astype(jnp.int32))
            # psum'd => UNIFORM across devices: safe lax.cond predicate
            ovf = jax.lax.psum(jax.lax.psum(ovf, "data"), "model")

            def owner_route(_):
                # 3. route buckets to their owning model shard
                if flat:
                    rid = jax.lax.all_to_all(
                        send_ids.reshape(m, C), "model",
                        split_axis=0, concat_axis=0)         # [m, C]
                    rg = jax.lax.all_to_all(
                        send_g.reshape(m, C, D), "model",
                        split_axis=0, concat_axis=0)         # [m, C, D]
                else:
                    rid = jax.lax.dynamic_slice(send_ids, (j * C,), (C,))
                    rg = jax.lax.dynamic_slice(send_g, (j * C, 0), (C, D))
                # 4. collect the owned buckets from the other batch shards
                gid = jax.lax.all_gather(rid, "data").reshape(-1)
                gg = jax.lax.all_gather(rg, "data").reshape(-1, D)
                # 5. merge: exact global per-unique-row sums for owned rows
                p = jnp.argsort(gid)                  # sentinels (=N) last
                sid = gid[p]
                sg = gg[p]
                K = sid.shape[0]
                # static cap: at most N distinct real rows + 1 sentinel run
                Kc = min(K, N + 1)
                fg = jnp.concatenate(
                    [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
                gsg = jnp.cumsum(fg.astype(jnp.int32)) - 1
                gm = jax.ops.segment_sum(sg, gsg, num_segments=Kc,
                                         indices_are_sorted=True)
                gu = jax.ops.segment_max(sid, gsg, num_segments=Kc,
                                         indices_are_sorted=True)
                nseg = gsg[-1] + 1
                valid = ((jnp.arange(Kc, dtype=jnp.int32) < nseg)
                         & (gu >= 0) & (gu < N))
                vf = valid[:, None].astype(jnp.float32)
                gmc = gm
                if max_norm > 0.0:
                    # ownership partitions the unique-id set: the exact
                    # global clip norm is the psum of disjoint partials
                    sumsq = jax.lax.psum(jnp.sum(gm * gm * vf), "model")
                    norm = jnp.sqrt(sumsq)
                    gmc = gm * jnp.where(norm > max_norm,
                                         max_norm / norm, 1.0)
                own2, loc = owner_local(jnp.where(valid, gu, 0), m, rows,
                                        interleaved)
                ok = valid & (own2 == j)
                return _adam_write_pmn(mn_s, loc, ok, gmc, t, D)

            def broadcast_fallback(_):
                # lossless overflow path: the exact broadcast merge for
                # this step (same math as compact_table_update_mesh)
                return _merge_broadcast_body(mn_s, gw_b[0], ids_b[0],
                                             gperm, gseg, t, N, D, True,
                                             axes, Mc_b, m)

            if overflow_fallback:
                new_mn_s = jax.lax.cond(ovf > 0, broadcast_fallback,
                                        owner_route, None)
            else:
                new_mn_s = owner_route(None)
            return new_mn_s, ovf

        ax = axes if flat else "data"
        # check_vma off as in the broadcast merge: the routed streams
        # are identical across a column after the all_gather, which the
        # checker cannot infer; this update is not differentiated through
        new_mn, ovf = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("model", None), P(ax, None, None), P(ax, None),
                      P(), P(), P()),
            out_specs=(P("model", None), P()),
            check_vma=False,
        )(mn, gw, plan.sorted_ids, plan.gperm, plan.gseg, t)
        return param, new_mn, ovf

    def finish_update(params, dense_grads, state, per_table):
        """Shared tail of every update variant: run `per_table(path,
        param, moments, t)` over the tables, then the flattened dense
        Adam, and rebuild (params, LazyAdamState)."""
        p_tables, p_dense = _split(params)
        count = state.count + 1
        t = count.astype(jnp.float32)

        new_tables, new_moments = {}, {}
        for path, param in p_tables.items():
            p_new, mn_new = per_table(path, param, state.moments[path], t)
            new_tables[path] = p_new
            new_moments[path] = mn_new

        updates, new_dense_opt = dense_tx.update(
            dense_grads, state.dense_opt, p_dense)
        new_dense = optax.apply_updates(p_dense, updates)

        merged = dict(new_dense)
        merged.update(new_tables)
        new_params = flax.traverse_util.unflatten_dict(merged)
        return new_params, LazyAdamState(
            moments=new_moments, count=count, dense_opt=new_dense_opt,
            route_overflow=state.route_overflow)

    def compact_mesh_update_fn(mesh, params, dense_grads, gws,
                               state: LazyAdamState, plans, table_names,
                               flat=False):
        """Mesh twin of compact_update_fn: per-table mesh-compact row
        updates + the flattened dense Adam (dense grads arrive already
        psum'd over the batch axes by GSPMD).

        cfg.mesh_update_routing='owner' takes the O(M/m) owner-routed
        merge for shardable tables (non-shardable tables keep the
        broadcast merge — their pmn arrays are replicated anyway)."""
        owner = getattr(cfg, "mesh_update_routing", "broadcast") == "owner"
        cap = getattr(cfg, "mesh_owner_capacity", 4.0)
        overflows = []

        def per_table(path, param, mn, t):
            name = table_names[path]
            if owner and param.shape[0] % mesh.shape["model"] == 0:
                p_new, mn_new, ovf = compact_table_update_mesh_owner(
                    mesh, param, gws[name], mn, plans[name], t, flat=flat,
                    capacity_factor=cap)
                overflows.append(ovf)
                return p_new, mn_new
            return compact_table_update_mesh(
                mesh, param, gws[name], mn, plans[name], t, flat=flat)

        new_params, new_state = finish_update(
            params, dense_grads, state, per_table)
        if overflows:
            total = overflows[0]
            for o in overflows[1:]:
                total = total + o
            new_state = new_state.replace(
                route_overflow=state.route_overflow + total)
        return new_params, new_state

    def compact_update_fn(params, dense_grads, gws, state: LazyAdamState,
                          plans, ws, table_names):
        """Apply compact table updates + the flattened dense Adam.

        dense_grads: flat {path: grad} for non-table params;
        gws: {table_name: dL/dw [M, D]}; plans/ws per compact_rows.py.
        """
        def per_table(path, param, mn, t):
            name = table_names[path]
            return compact_table_update(
                param, ws[name], gws[name], mn, plans[name], t)

        return finish_update(params, dense_grads, state, per_table)

    def update_fn(params, grads, state: LazyAdamState, table_ids):
        from clsr_tpu.parallel.embedding import (active_flat_batch,
                                                 active_mesh)

        g_tables, g_dense = _split(grads)
        mesh = active_mesh()

        def per_table(path, param, mn, t):
            name = str(path[-1])
            ids = table_ids.get(name)
            if ids is None:
                raise ValueError(
                    f"lazyadam: no touched-row mapping for table {name}")
            if (mesh is not None
                    and param.shape[0] % mesh.shape["model"] == 0):
                return table_update_sharded(
                    mesh, param, g_tables[path], mn, ids, t,
                    flat=active_flat_batch())
            return table_update(param, g_tables[path], mn, ids, t)

        return finish_update(params, g_dense, state, per_table)

    update_fn.compact = compact_update_fn
    update_fn.compact_mesh = compact_mesh_update_fn
    return init_fn, update_fn
