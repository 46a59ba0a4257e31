"""Honest stage decomposition of the CLSR train step.

Times the resident-data train program at B=512 Taobao dims in four
nested modes, all sharing one call structure so the sync-mode relay
round-trip floor (clsr_tpu/utils/device.py) cancels in differences:

  fwd      forward + losses only
  grad     + backward (jax.grad), no update
  grad_sg  + backward, but table lookups wrapped in stop_gradient —
           the difference (grad - grad_sg) is the cost of the
           table-gradient backward: XLA scatter-adds for every lookup
           site (reference: sequential_base_model.py:364-438 lookups,
           clsr.py:118-127 involved-row L2)
  full     + LazyAdam update (sort-dedup + row gather/scatter-set,
           training/lazy_adam.py)

Usage: python scripts/profile_step.py [--batch 512] [--k 32]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from __graft_entry__ import _taobao_cfg
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.resident import (build_resident, epoch_permutation,
                                        gather_batch)
    from clsr_tpu.data.synthetic import write_synthetic_dataset_fast
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.negative_sampling import expand_with_negatives
    from clsr_tpu.training.losses import total_loss
    from clsr_tpu.training.lazy_adam import batch_table_ids, make_lazy_optimizer
    from clsr_tpu.utils.device import force_sync_dispatch
    import clsr_tpu.parallel.embedding as pe
    import clsr_tpu.models.base as mb

    data_dir = os.path.join("/tmp", "clsr_bench_data")
    train_file = os.path.join(data_dir, "train_data")
    if not os.path.exists(train_file):
        write_synthetic_dataset_fast(
            data_dir, n_users=8000, n_items=100_000, n_cates=5000)
    vocabs = [load_vocab(os.path.join(data_dir, f"{n}_vocab.pkl"))
              for n in ("user", "item", "cate")]
    ds = parse_file(train_file, *vocabs, time_unit="s")
    loader = SequenceLoader(ds, 50)
    B, K = args.batch, args.k
    cfg = _taobao_cfg(batch_size=B, optimizer="lazyadam",
                      train_steps_per_call=K)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=len(vocabs[0]), n_items=len(vocabs[1]),
        n_cates=len(vocabs[2]))
    res = build_resident(loader.view)
    jax.block_until_ready(res.item_hist)
    eligible = np.flatnonzero(loader.view.lengths >= 1)
    np_rng = np.random.RandomState(0)
    perm, n, n_calls, _ = epoch_permutation(eligible, np_rng, B, K)
    perm_dev = jax.device_put(perm)
    sample = next(loader.train_batches(B, np.random.RandomState(0)))
    state = create_train_state(model, cfg, sample)
    _, lazy_update = make_lazy_optimizer(cfg)
    num_ngs = cfg.train_num_ngs

    # stop-gradient wrappers for grad_sg mode
    orig_gather = pe.gather_rows
    orig_gather_rep_pe = pe.gather_rows_replicated
    orig_gather_rep_mb = mb.gather_rows_replicated

    def install_sg(on: bool):
        if on:
            pe.gather_rows = lambda t, i, **kw: jax.lax.stop_gradient(
                orig_gather(t, i, **kw))
            pe.gather_rows_replicated = lambda t, i, **kw: \
                jax.lax.stop_gradient(orig_gather_rep_pe(t, i, **kw))
            mb.gather_rows_replicated = pe.gather_rows_replicated
        else:
            pe.gather_rows = orig_gather
            pe.gather_rows_replicated = orig_gather_rep_pe
            mb.gather_rows_replicated = orig_gather_rep_mb

    def make_prog(mode):
        def prog(state, res, perm, offset, rng):
            def body(carry, k):
                st, acc = carry
                rk = jax.random.fold_in(rng, k)
                rs, rd = jax.random.split(rk)
                idx = jax.lax.dynamic_slice(perm, (offset + k * B,), (B,))
                batch = gather_batch(res, idx, jnp.ones(B, bool))
                batch = expand_with_negatives(rs, batch, num_ngs)

                def loss_fn(params):
                    variables = {"params": params,
                                 "batch_stats": st.batch_stats}
                    (logits, aux), mut = st.apply_fn(
                        variables, batch, train=True,
                        rngs={"dropout": rd}, mutable=["batch_stats"])
                    parts = total_loss(cfg, logits, aux, batch, params)
                    return parts.loss, parts

                if mode == "fwd":
                    loss, parts = loss_fn(st.params)
                    return (st, acc + loss), 0
                grads, parts = jax.grad(loss_fn, has_aux=True)(st.params)
                if mode in ("grad", "grad_sg"):
                    gs = sum(jnp.sum(g[:8] if g.ndim == 2
                                     and g.shape[0] > 1000 else g)
                             for g in jax.tree_util.tree_leaves(grads))
                    return (st, acc + parts.loss + 0.0 * gs), 0
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
    results = {}
    for mode in ("fwd", "grad", "grad_sg", "full"):
        install_sg(mode == "grad_sg")
        prog = make_prog(mode)
        out = prog(state, res, perm_dev, np.int32(0), r)
        out.block_until_ready()
        force_sync_dispatch()
        times = []
        for c in range(1, args.calls + 1):
            t0 = time.perf_counter()
            out = prog(state, res, perm_dev,
                       np.int32((c % max(n_calls - 1, 1)) * K * B),
                       jax.random.fold_in(r, c))
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        install_sg(False)
        med = float(np.median(times))
        results[mode] = med
        print(f"{mode:8s}: call {med*1e3:8.1f}ms  per-step "
              f"{med/K*1e3:6.2f}ms", flush=True)

    f, g, gs, fu = (results[m] for m in ("fwd", "grad", "grad_sg", "full"))
    print(f"-- backward total      : {(g - f)/K*1e3:6.2f}ms/step")
    print(f"-- table-grad scatters : {(g - gs)/K*1e3:6.2f}ms/step "
          f"(grad - grad_sg)")
    print(f"-- lazyadam update     : {(fu - g)/K*1e3:6.2f}ms/step")


if __name__ == "__main__":
    main()
