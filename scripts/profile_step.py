"""Honest stage decomposition of the CLSR train step.

Times the train program in nested modes, all sharing one call structure
so the sync-mode relay round-trip floor (clsr_tpu/utils/device.py)
cancels in differences:

  fwd      forward + losses only
  grad     + backward (jax.grad), no update
  grad_sg  + backward with table lookups stop-gradiented (legacy engine
           only) — (grad - grad_sg) is the cost of the table-gradient
           backward: XLA scatter-adds for every lookup site (reference:
           sequential_base_model.py:364-438, clsr.py:118-127)
  full     + LazyAdam update

--compact auto profiles the compact row engine
(training/compact_rows.py) instead of the legacy formulation;
--kuaishou switches to L=250 / 500k-vocab / B=256 with on-device
synthesized batches (the HBM-table regime).

Usage: python scripts/profile_step.py [--kuaishou] [--compact auto]
           [--modes fwd,grad,full]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--kuaishou", action="store_true",
                    help="L=250, 500k vocab, B=256, on-device batches")
    ap.add_argument("--compact", default="off",
                    help="auto|off — compact row engine")
    ap.add_argument("--modes", default="fwd,grad,grad_sg,full")
    args = ap.parse_args()

    import flax.traverse_util as tu
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.negative_sampling import expand_with_negatives
    from clsr_tpu.training.losses import total_loss
    from clsr_tpu.training.lazy_adam import (batch_table_ids,
                                             make_lazy_optimizer)
    from clsr_tpu.training.compact_rows import (build_plans, gather_ws,
                                                make_context,
                                                supported_tables,
                                                use_compact_rows)
    from clsr_tpu.utils.device import force_sync_dispatch
    import clsr_tpu.parallel.embedding as pe
    import clsr_tpu.models.base as mb

    use_compact = args.compact == "auto"
    K = args.k

    if args.kuaishou:
        B, SEQ = 256, 250
        N_ITEMS, N_CATES, N_USERS = 500_000, 2_000, 100_000
        K = min(K, 8)
        cfg = _taobao_cfg(batch_size=B, optimizer="lazyadam",
                          max_seq_length=SEQ, time_unit="ms",
                          compact_rows=args.compact)
        from clsr_tpu.data.synthetic import device_batch as _db
        make_batch = lambda key, k: _db(jax.random.fold_in(key, k), B, SEQ,
                                        N_ITEMS, N_CATES, N_USERS)
        data_args = ()
    else:
        B = args.batch
        from clsr_tpu.data.loader import SequenceLoader
        from clsr_tpu.data.parser import parse_file
        from clsr_tpu.data.resident import (build_resident,
                                            epoch_permutation, gather_batch)
        from clsr_tpu.data.synthetic import write_synthetic_dataset_fast
        from clsr_tpu.data.vocab import load_vocab

        data_dir = os.path.join("/tmp", "clsr_bench_data")
        train_file = os.path.join(data_dir, "train_data")
        if not os.path.exists(train_file):
            write_synthetic_dataset_fast(
                data_dir, n_users=8000, n_items=100_000, n_cates=5000)
        vocabs = [load_vocab(os.path.join(data_dir, f"{n}_vocab.pkl"))
                  for n in ("user", "item", "cate")]
        ds = parse_file(train_file, *vocabs, time_unit="s")
        loader = SequenceLoader(ds, 50)
        N_USERS, N_ITEMS, N_CATES = (len(v) for v in vocabs)
        cfg = _taobao_cfg(batch_size=B, optimizer="lazyadam",
                          compact_rows=args.compact)
        res = build_resident(loader.view)
        jax.block_until_ready(res.item_hist)
        eligible = np.flatnonzero(loader.view.lengths >= 1)
        perm, n_use, n_calls, _ = epoch_permutation(
            eligible, np.random.RandomState(0), B, K)
        perm_dev = jax.device_put(perm)
        data_args = (res, perm_dev)

        def make_batch(key, k, res=None, perm=None, offset=0):
            idx = jax.lax.dynamic_slice(perm, (offset + k * B,), (B,))
            return gather_batch(res, idx, jnp.ones(B, bool))

    model = get_model_class("clsr")(
        cfg=cfg, n_users=N_USERS, n_items=N_ITEMS, n_cates=N_CATES)
    from __graft_entry__ import _tiny_batch
    sample = _tiny_batch(B=B, L=cfg.max_seq_length, n_items=N_ITEMS,
                         n_cates=N_CATES)
    state = create_train_state(model, cfg, sample)
    _, lazy_update = make_lazy_optimizer(cfg)
    num_ngs = cfg.train_num_ngs

    # stop-gradient wrappers for grad_sg mode (legacy engine only)
    orig_gather = pe.gather_rows
    orig_gather_rep = pe.gather_rows_replicated

    def install_sg(on: bool):
        if on:
            pe.gather_rows = lambda t, i, **kw: jax.lax.stop_gradient(
                orig_gather(t, i, **kw))
            pe.gather_rows_replicated = lambda t, i, **kw: \
                jax.lax.stop_gradient(orig_gather_rep(t, i, **kw))
        else:
            pe.gather_rows = orig_gather
            pe.gather_rows_replicated = orig_gather_rep
        mb.gather_rows_replicated = pe.gather_rows_replicated

    def probe(tree):
        return sum(jnp.sum(g[:8] if g.ndim == 2 and g.shape[0] > 1000
                           else g)
                   for g in jax.tree_util.tree_leaves(tree))

    def make_prog(mode):
        def prog(state, rng, offset, *dargs):
            def body(carry, k):
                st, acc = carry
                rk = jax.random.fold_in(rng, k)
                rs, rd = jax.random.split(rk)
                if args.kuaishou:
                    batch = make_batch(rs, k)
                else:
                    batch = make_batch(rs, k, res=dargs[0], perm=dargs[1],
                                       offset=offset)
                batch = expand_with_negatives(rs, batch, num_ngs)

                if use_compact:
                    from clsr_tpu.training.lazy_adam import is_pmn
                    table_names = supported_tables(st.params)
                    flat = tu.flatten_dict(st.params)
                    tables = {p: v for p, v in flat.items()
                              if p in table_names}
                    dense = {p: v for p, v in flat.items()
                             if p not in table_names}
                    plans = build_plans(table_names, batch)
                    fused = all(is_pmn(v, st.opt_state.moments[p])
                                for p, v in tables.items())
                    if fused:   # pmn layout (steps.compact_step)
                        src = {p: st.opt_state.moments[p] for p in tables}
                        ws_full = gather_ws(src, table_names, plans)
                        ws = {table_names[p]:
                              ws_full[table_names[p]][:, :v.shape[1]]
                              .astype(v.dtype)
                              for p, v in tables.items()}
                    else:
                        ws_full = None
                        ws = gather_ws(tables, table_names, plans)

                    def loss_fn(dense_flat, ws_in):
                        merged = dict(dense_flat)
                        merged.update(tables)
                        params = tu.unflatten_dict(merged)
                        with use_compact_rows(make_context(plans, ws_in)):
                            (logits, aux), _ = st.apply_fn(
                                {"params": params,
                                 "batch_stats": st.batch_stats},
                                batch, train=True, rngs={"dropout": rd},
                                mutable=["batch_stats"])
                        parts = total_loss(cfg, logits, aux, batch, params)
                        return parts.loss, parts

                    if mode == "fwd":
                        loss, parts = loss_fn(dense, ws)
                        return (st, acc + loss), 0
                    (gd, gws), parts = jax.grad(
                        loss_fn, argnums=(0, 1), has_aux=True)(dense, ws)
                    if mode == "grad":
                        return (st, acc + parts.loss
                                + 0.0 * (probe(gd) + probe(gws))), 0
                    new_params, new_opt = lazy_update.compact(
                        st.params, gd, gws, st.opt_state, plans,
                        ws_full if fused else ws, table_names)
                    st = st.replace(step=st.step + 1, params=new_params,
                                    opt_state=new_opt)
                    return (st, acc + parts.loss), 0

                def loss_fn(params):
                    (logits, aux), _ = st.apply_fn(
                        {"params": params, "batch_stats": st.batch_stats},
                        batch, train=True, rngs={"dropout": rd},
                        mutable=["batch_stats"])
                    parts = total_loss(cfg, logits, aux, batch, params)
                    return parts.loss, parts

                if mode == "fwd":
                    loss, parts = loss_fn(st.params)
                    return (st, acc + loss), 0
                grads, parts = jax.grad(loss_fn, has_aux=True)(st.params)
                if mode in ("grad", "grad_sg"):
                    return (st, acc + parts.loss + 0.0 * probe(grads)), 0
                new_params, new_opt = lazy_update(
                    st.params, grads, st.opt_state, batch_table_ids(batch))
                st = st.replace(step=st.step + 1, params=new_params,
                                opt_state=new_opt)
                return (st, acc + parts.loss), 0

            (st, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), jnp.arange(K))
            return acc
        return jax.jit(prog)

    r = jax.random.PRNGKey(0)
    modes = args.modes.split(",")
    results = {}
    for mode in modes:
        if mode == "grad_sg" and use_compact:
            continue
        install_sg(mode == "grad_sg")
        prog = make_prog(mode)
        out = prog(state, r, np.int32(0), *data_args)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, args.calls + 1):
            t0 = time.perf_counter()
            out = prog(state, jax.random.fold_in(r, c), np.int32(0),
                       *data_args)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        install_sg(False)
        med = float(np.median(times))
        results[mode] = med
        print(f"{mode:8s}: call {med*1e3:8.1f}ms  per-step "
              f"{med/K*1e3:6.2f}ms", flush=True)

    if "fwd" in results and "grad" in results:
        print(f"-- backward total      : "
              f"{(results['grad'] - results['fwd'])/K*1e3:6.2f}ms/step")
    if "grad_sg" in results and "grad" in results:
        print(f"-- table-grad scatters : "
              f"{(results['grad'] - results['grad_sg'])/K*1e3:6.2f}ms/step")
    if "full" in results and "grad" in results:
        print(f"-- optimizer update    : "
              f"{(results['full'] - results['grad'])/K*1e3:6.2f}ms/step")


if __name__ == "__main__":
    main()
