"""Pallas row-update experiments: can a kernel beat XLA's row ops?

The honest Kuaishou profile (docs/RESULTS_r2.md) shows the LazyAdam
optimizer tail dominates the step (26ms legacy, ~half that compact) and
the row-op cost model pins XLA's random row access at 43-85ns/row on a
500k-row HBM table — ~1% of streaming bandwidth.  At Kuaishou density
(~58k unique touched rows of 500k = 12%) a full-table streaming sweep
costs less than 65k random accesses IF the per-row alignment work inside
the kernel is cheap.  This measures the candidate primitives:

  xla-*        XLA baselines (sorted-unique scatter-set, fused-moment
               gather) at the compact engine's exact shapes
  sweep-loop   Pallas sweep: stream [BLOCK, D] table blocks through
               VMEM, align compact rows to block rows with a dynamic
               fori_loop of scalar row copies (alignment cost question)
  sweep-vec    same, alignment via in-VMEM vectorized gather/scatter
               (jnp .at[].set on a VMEM value — does Mosaic lower it,
               and at what speed?)
  rowdma       per-row DMA writes straight to HBM (DMA-issue-cost
               question: ~195k descriptor writes per step if used for
               the full update)

Usage: python scripts/bench_pallas_update.py [--interpret] [--rows N]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=40)
    ap.add_argument("--ids", type=int, default=58_000,
                    help="unique touched rows (sorted)")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--calls", type=int, default=12)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--only", default="",
                    help="comma-separated variant filter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    N, D, M, K = args.rows, args.dim, args.ids, args.reps
    BLOCK = args.block
    NB = (N + BLOCK - 1) // BLOCK
    rng = np.random.RandomState(0)
    only = [s for s in args.only.split(",") if s]

    table0 = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.05)
    newrows0 = jnp.asarray(rng.randn(M, D).astype(np.float32) * 0.05)

    def fresh_ids(key):
        """M sorted ids, mildly skewed toward low ids (frequency-sorted
        vocab), deduplicated by construction (stride jitter)."""
        u = jax.random.uniform(key, (M,)) ** 1.3  # skew low
        ids = jnp.sort((u * (N - 1)).astype(jnp.int32))
        # enforce strictly-nondecreasing -> unique by nudging runs
        return ids

    def run(label, make_prog, *operands):
        if only and label not in only:
            return
        from clsr_tpu.utils.device import force_sync_dispatch
        prog = jax.jit(make_prog)
        times = []
        out = None
        try:
            for c in range(args.calls + 4):
                key = jax.random.PRNGKey(c)
                t0 = time.perf_counter()
                out = prog(key, *operands)
                jax.block_until_ready(out)
                if c == 0:
                    force_sync_dispatch()
                if c >= 4:
                    times.append(time.perf_counter() - t0)
        except Exception as e:  # keep surveying other variants
            print(f"{label:14s} FAILED: {type(e).__name__}: {e}")
            return
        med = float(np.median(times))
        per_app = med / K
        leaf = jax.tree_util.tree_leaves(out)[0]
        print(f"{label:14s} {per_app * 1e6:9.1f}us/app  "
              f"({per_app / M * 1e9:6.1f}ns/row)  sum={float(jnp.sum(leaf)):.3e}",
              flush=True)

    # ---- XLA baselines --------------------------------------------------
    def xla_scatter_set(key, table, newrows):
        def body(t, k):
            ids = fresh_ids(jax.random.fold_in(key, k))
            t = t.at[ids].set(newrows, mode="drop",
                              indices_are_sorted=True, unique_indices=True)
            return t, 0
        t, _ = jax.lax.scan(body, table, jnp.arange(K))
        return t

    def xla_gather(key, table):
        def body(acc, k):
            ids = fresh_ids(jax.random.fold_in(key, k))
            return acc + table.at[ids].get(indices_are_sorted=True).sum(), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    run("xla-set", xla_scatter_set, table0, newrows0)
    run("xla-gather", xla_gather, table0)

    # ---- Pallas sweep kernels ------------------------------------------
    # grid over table blocks; ids/newrows chunks DMA'd per block using
    # scalar-prefetched per-block segment starts.
    MAXSEG = 2048  # ids processed per inner chunk (while-loop if more)

    def seg_starts(ids):
        """starts[b] = first position whose id >= b*BLOCK (ids sorted)."""
        blk = ids // BLOCK
        counts = jax.ops.segment_sum(jnp.ones_like(blk), blk,
                                     num_segments=NB)
        return jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts).astype(jnp.int32)])

    IDALIGN = 1024   # int32 1-D VMEM/HBM tiling: dynamic slice offsets
    ROWALIGN = 8     # f32 2-D sublane tiling

    def make_sweep(align):
        idspace = pltpu.SMEM if align == "loop" else pltpu.VMEM

        def kernel(starts_ref, ids_hbm, rows_hbm, tin_ref, tout_ref,
                   idbuf, rowbuf, sems):
            b = pl.program_id(0)
            lo = b * BLOCK
            start, end = starts_ref[b], starts_ref[b + 1]
            tout_ref[:] = tin_ref[:]

            def chunk(s, _):
                n = jnp.minimum(end - s, MAXSEG)
                # dynamic-offset DMA sources must be provably aligned to
                # the memref tiling — slice from an aligned base and skip
                # the remainder via the scratch offset
                s_id = pl.multiple_of((s // IDALIGN) * IDALIGN, IDALIGN)
                off_id = s - s_id
                s_row = pl.multiple_of((s // ROWALIGN) * ROWALIGN,
                                       ROWALIGN)
                off_row = s - s_row
                cp1 = pltpu.make_async_copy(
                    ids_hbm.at[pl.ds(s_id, MAXSEG + IDALIGN)], idbuf,
                    sems.at[0])
                cp2 = pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(s_row, MAXSEG + ROWALIGN), :],
                    rowbuf, sems.at[1])
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                if align == "loop":
                    def row(j, _):
                        rid = idbuf[off_id + j] - lo
                        tout_ref[rid, :] = rowbuf[off_row + j, :]
                        return 0
                    jax.lax.fori_loop(0, n, row, 0)
                else:  # vectorized in-VMEM scatter probe
                    lid = idbuf[pl.ds(off_id, MAXSEG)] - lo
                    valid = (jax.lax.broadcasted_iota(
                        jnp.int32, (MAXSEG, 1), 0).squeeze(-1) < n)
                    lid = jnp.where(valid, lid, BLOCK)  # drop tail
                    blockvals = tout_ref[:]
                    blockvals = blockvals.at[lid].set(
                        rowbuf[pl.ds(off_row, MAXSEG), :], mode="drop",
                        unique_indices=True)
                    tout_ref[:] = blockvals
                return 0

            nchunks = (end - start + MAXSEG - 1) // MAXSEG
            jax.lax.fori_loop(
                0, nchunks, lambda c, _: chunk(start + c * MAXSEG, _), 0)

        def prog(key, table, newrows):
            def body(t, k):
                ids = fresh_ids(jax.random.fold_in(key, k))
                starts = seg_starts(ids)
                # pad so the trailing chunk's fixed-size DMA stays in
                # bounds
                ids_p = jnp.concatenate(
                    [ids, jnp.full((MAXSEG + IDALIGN,), N, jnp.int32)])
                rows_p = jnp.concatenate(
                    [newrows,
                     jnp.zeros((MAXSEG + ROWALIGN, D), newrows.dtype)])
                t = pl.pallas_call(
                    kernel,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(NB,),
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.HBM),
                            pl.BlockSpec(memory_space=pltpu.HBM),
                            pl.BlockSpec((BLOCK, D), lambda i, s: (i, 0)),
                        ],
                        out_specs=pl.BlockSpec((BLOCK, D),
                                               lambda i, s: (i, 0)),
                        scratch_shapes=[
                            idspace((MAXSEG + IDALIGN,), jnp.int32),
                            pltpu.VMEM((MAXSEG + ROWALIGN, D),
                                       newrows.dtype),
                            pltpu.SemaphoreType.DMA((2,)),
                        ],
                    ),
                    out_shape=jax.ShapeDtypeStruct((N, D), table.dtype),
                    input_output_aliases={3: 0},
                    interpret=args.interpret,
                )(starts, ids_p, rows_p, t)
                return t, 0
            t, _ = jax.lax.scan(body, table, jnp.arange(K))
            return t

        return prog

    run("sweep-loop", make_sweep("loop"), table0, newrows0)
    run("sweep-vec", make_sweep("vec"), table0, newrows0)

    # ---- per-row DMA writes (no sweep) ---------------------------------
    CHUNK = 1024   # int32 tiling: chunk starts must be 1024-aligned
    NCH = (M + CHUNK - 1) // CHUNK

    def rowdma_kernel(ids_hbm, rows_hbm, tin_hbm, tout_ref, idbuf, rowbuf,
                      sems, wsems):
        c = pl.program_id(0)
        s = c * CHUNK
        cp1 = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(s, CHUNK)], idbuf, sems.at[0])
        cp2 = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(s, CHUNK), :], rowbuf, sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        def row(j, _):
            rid = idbuf[j]
            w = pltpu.make_async_copy(
                rowbuf.at[pl.ds(j, 1), :],
                tout_ref.at[pl.ds(rid, 1), :], wsems.at[j % 8])
            w.start()
            return 0

        jax.lax.fori_loop(0, CHUNK, row, 0)
        # drain: reconstruct equivalent copies (same sem, same byte
        # count) and wait each — DMA sems can only be waited via a copy
        def unrow(j, _):
            rid = idbuf[j]
            pltpu.make_async_copy(
                rowbuf.at[pl.ds(j, 1), :],
                tout_ref.at[pl.ds(rid, 1), :], wsems.at[j % 8]).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, unrow, 0)

    def rowdma_prog(key, table, newrows):
        def body(t, k):
            ids = fresh_ids(jax.random.fold_in(key, k))
            pad = CHUNK * NCH - M
            ids_p = jnp.concatenate([ids, jnp.full((pad,), N - 1,
                                                   jnp.int32)])
            rows_p = jnp.concatenate(
                [newrows, jnp.zeros((pad, D), newrows.dtype)])
            # harmless: padded rows re-write row N-1 with zeros — this
            # is a bandwidth experiment, not a correctness path
            t = pl.pallas_call(
                rowdma_kernel,
                grid=(NCH,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[
                    pltpu.SMEM((CHUNK,), jnp.int32),
                    pltpu.VMEM((CHUNK, D), newrows.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((8,)),
                ],
                out_shape=jax.ShapeDtypeStruct((N, D), table.dtype),
                input_output_aliases={2: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=args.interpret,
            )(ids_p, rows_p, t)
            return t, 0
        t, _ = jax.lax.scan(body, table, jnp.arange(K))
        return t

    run("rowdma", rowdma_prog, table0, newrows0)


if __name__ == "__main__":
    main()
