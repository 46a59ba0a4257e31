"""Jit-compiled train / eval steps.

The reference runs one sess.run per feed_dict (clsr.py:383-408); here the
whole step — on-device negative sampling, forward, 4-part loss, backward,
per-tensor clip, Adam update, BN stat update — is ONE XLA program.  Batches
are donated so parameters update in place in HBM.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.training.losses import LossParts, total_loss
from clsr_tpu.training.negative_sampling import expand_with_negatives
from clsr_tpu.training.state import TrainState


def make_train_step_fn(model, cfg: Config,
                       allow_pallas: Optional[bool] = None) -> Callable:
    """The raw (unjitted) train step: (state, batch, rng) -> (state, LossParts).

    `batch` carries G=1 (positives only); negatives are sampled on-device
    (1 + train_num_ngs candidate targets per row).

    `allow_pallas` gates the fused TRAIN attention scorer
    (ops/pallas_attention.py:fused_train_attention); None defers to
    cfg.use_pallas_train_attention ('auto' = TPU backend only).  The
    mesh step builders also pass None and install
    use_train_attention_mesh, routing the scorer through the shard_map
    island (fused_train_attention_mesh) with global batch-BN psums — a
    bare pallas_call never lands in a GSPMD program.
    """
    num_ngs = cfg.train_num_ngs
    if allow_pallas is None:
        flag = getattr(cfg, "use_pallas_train_attention", "off")
        use_train_kernel = (flag == "on" or
                            (flag == "auto"
                             and jax.default_backend() == "tpu"))
    else:
        use_train_kernel = allow_pallas
    lazy_update = None
    if cfg.optimizer == "lazyadam":
        from clsr_tpu.training.lazy_adam import (batch_table_ids,
                                                 make_lazy_optimizer)
        _, lazy_update = make_lazy_optimizer(cfg)
    per_position = (cfg.model_type == "nextitnet"
                    and cfg.nextitnet_per_position)

    use_compact = (cfg.optimizer == "lazyadam" and not per_position
                   and getattr(cfg, "compact_rows", "auto") != "off")

    def compact_loss_fn(state, batch, rng_drop, tables, plans, ctx_factory):
        """Shared loss closure for both compact engines: tables are
        non-differentiated (lookups come from the compact ws), the
        engine context is installed via ctx_factory(ws_in)."""
        import flax.traverse_util as tu

        from clsr_tpu.training.compact_rows import use_compact_rows

        def loss_fn(dense_flat, ws_in):
            merged = dict(dense_flat)
            merged.update(tables)          # tables: non-differentiated
            params = tu.unflatten_dict(merged)
            variables = {"params": params, "batch_stats": state.batch_stats}
            with use_compact_rows(ctx_factory(plans, ws_in)):
                (logits, aux), mutated = state.apply_fn(
                    variables, batch, train=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats"])
            parts = total_loss(cfg, logits, aux, batch, params)
            stats = mutated.get("batch_stats", state.batch_stats)
            if not stats:
                # no BN in the model: apply() hands back an empty plain
                # dict while the state holds an empty FrozenDict — keep
                # the carry pytree structure stable for lax.scan
                stats = state.batch_stats
            return parts.loss, (parts, stats)

        return loss_fn

    def compact_step(state: TrainState, batch: Batch, rng_drop, table_names):
        """Compact row engine path (training/compact_rows.py): one sorted
        gather per table, backward in w-space, sorted+unique row writes.

        With the pmn fused-table layout (lazy_adam.LazyAdamState) the
        gather reads the [N, 3D] param|mu|nu array instead: the Adam
        moments ride along in the same HBM rows (XLA lane-pads [N, D]
        rows to 128 lanes, so the wider read is free) and the update
        needs no second gather — one scatter-set per table per step.
        `state.params` tables are left stale inside the step and synced
        at the jit boundary (sync_params_from_opt)."""
        import flax.traverse_util as tu

        from clsr_tpu.training.compact_rows import (build_plans, gather_ws,
                                                    make_context)
        from clsr_tpu.training.lazy_adam import is_pmn

        flat = tu.flatten_dict(state.params)
        tables = {p: v for p, v in flat.items() if p in table_names}
        dense = {p: v for p, v in flat.items() if p not in table_names}
        plans = build_plans(table_names, batch)
        fused = all(is_pmn(v, state.opt_state.moments[p])
                    for p, v in tables.items())
        if fused:
            src = {p: state.opt_state.moments[p] for p in tables}
            ws_full = gather_ws(src, table_names, plans)
            ws = {table_names[p]:
                  ws_full[table_names[p]][:, :v.shape[1]].astype(v.dtype)
                  for p, v in tables.items()}
        else:
            ws_full = None
            ws = gather_ws(tables, table_names, plans)

        loss_fn = compact_loss_fn(state, batch, rng_drop, tables, plans,
                                  make_context)
        (g_dense, gws), (parts, new_stats) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(dense, ws)
        new_params, new_opt = lazy_update.compact(
            state.params, g_dense, gws, state.opt_state, plans,
            ws_full if fused else ws, table_names)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt, batch_stats=new_stats)
        return state, parts

    def mesh_compact_step(state: TrainState, batch: Batch, rng_drop,
                          table_names, mesh):
        """Mesh-compact path (training/mesh_compact.py, ROADMAP 8):
        per-data-shard plans, one collective row gather per table,
        w-space backward sharded over 'data', globally-merged row
        updates on the owning model shards.  pmn layout only."""
        import flax.traverse_util as tu

        from clsr_tpu.training.mesh_compact import (build_mesh_plans,
                                                    gather_mesh_ws,
                                                    make_mesh_context)

        from clsr_tpu.parallel.embedding import active_flat_batch
        flat_mode = active_flat_batch()

        flat = tu.flatten_dict(state.params)
        tables = {p: v for p, v in flat.items() if p in table_names}
        dense = {p: v for p, v in flat.items() if p not in table_names}
        plans = build_mesh_plans(mesh, table_names, batch, flat=flat_mode)
        src = {p: state.opt_state.moments[p] for p in tables}
        ws_full = gather_mesh_ws(src, table_names, plans)  # [d, Mi, 3D]
        ws = {table_names[p]:
              ws_full[table_names[p]][:, :, :v.shape[1]].astype(v.dtype)
              for p, v in tables.items()}

        loss_fn = compact_loss_fn(state, batch, rng_drop, tables, plans,
                                  make_mesh_context)
        (g_dense, gws), (parts, new_stats) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(dense, ws)
        new_params, new_opt = lazy_update.compact_mesh(
            mesh, state.params, g_dense, gws, state.opt_state, plans,
            table_names, flat=flat_mode)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt, batch_stats=new_stats)
        return state, parts

    def _step_inner(state: TrainState, batch: Batch, rng: jax.Array):
        rng_samp, rng_drop = jax.random.split(rng)
        if cfg.need_sample and num_ngs > 0:
            if per_position:
                from clsr_tpu.training.negative_sampling import \
                    expand_nextitnet
                batch = expand_nextitnet(rng_samp, batch, num_ngs)
            else:
                batch = expand_with_negatives(rng_samp, batch, num_ngs)

        if use_compact:
            from clsr_tpu.parallel.embedding import active_mesh
            from clsr_tpu.training.compact_rows import supported_tables
            from clsr_tpu.training.lazy_adam import is_pmn
            table_names = supported_tables(state.params)
            mesh = active_mesh()
            if table_names is not None:
                if mesh is None:
                    return compact_step(state, batch, rng_drop, table_names)
                import flax.traverse_util as tu
                flat = tu.flatten_dict(state.params)
                fused = all(
                    is_pmn(flat[p], state.opt_state.moments[p])
                    for p in table_names)
                if fused:
                    return mesh_compact_step(state, batch, rng_drop,
                                             table_names, mesh)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (logits, aux), mutated = state.apply_fn(
                variables, batch, train=True,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"])
            parts = total_loss(cfg, logits, aux, batch, params)
            stats = mutated.get("batch_stats", state.batch_stats)
            if not stats:
                # no BN in the model: apply() hands back an empty plain
                # dict while the state holds an empty FrozenDict — keep
                # the carry pytree structure stable for lax.scan
                stats = state.batch_stats
            return parts.loss, (parts, stats)

        grads, (parts, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        if lazy_update is not None:
            new_params, new_opt = lazy_update(
                state.params, grads, state.opt_state, batch_table_ids(batch))
            state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        else:
            state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, parts

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        from clsr_tpu.ops.pallas_attention import use_train_attention
        with use_train_attention(use_train_kernel):
            return _step_inner(state, batch, rng)

    return step


def sync_params_from_opt(state: TrainState) -> TrainState:
    """Refresh `state.params` table leaves from pmn fused-table rows.

    Under the fused layout the compact step updates only the [N, 3D]
    param|mu|nu arrays (one scatter-set per table); the params-tree
    tables are a lagging copy.  This slice-copy (a contiguous stream,
    ~0.1-0.6ms even at 500k rows) restores them at jit-call boundaries
    so eval / checkpoint / serving / tests always observe fresh
    parameters.  No-op for every other optimizer/layout."""
    from clsr_tpu.training.lazy_adam import LazyAdamState, is_pmn

    if not isinstance(state.opt_state, LazyAdamState):
        return state
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(state.params))
    changed = False
    for p, mn in state.opt_state.moments.items():
        v = flat[p]
        if is_pmn(v, mn):
            flat[p] = mn[:, :v.shape[1]].astype(v.dtype)
            changed = True
    if not changed:
        return state
    return state.replace(params=tu.unflatten_dict(flat))


def make_train_step(model, cfg: Config, donate: bool = True) -> Callable:
    """Jitted single-device train step (params synced at the boundary)."""
    raw = make_train_step_fn(model, cfg)

    def step(state, batch, rng):
        state, parts = raw(state, batch, rng)
        return sync_params_from_opt(state), parts

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(model, cfg: Config, steps_per_call: int,
                          donate: bool = True) -> Callable:
    """K train steps per dispatch: scan over a [K, B, ...]-stacked batch.

    Per-call host->device dispatch costs dominate this model's ~0.1ms
    device step (measured ~0.7ms/call on the v5e tunnel); batching K steps
    into one `lax.scan` amortizes it K-fold.  Semantics are identical to K
    sequential train_step calls with rngs fold_in(rng, 0..K-1).

    Returns multi_step(state, stacked_batch, rng) -> (state, LossParts[K]).
    """
    raw = make_train_step_fn(model, cfg)

    def multi(state: TrainState, batches: Batch, rng: jax.Array):
        def body(st, inp):
            i, batch = inp
            st, parts = raw(st, batch, jax.random.fold_in(rng, i))
            return st, parts

        idx = jnp.arange(steps_per_call)
        state, parts = jax.lax.scan(body, state, (idx, batches))
        return sync_params_from_opt(state), parts

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def stack_batches(batches) -> Batch:
    """Stack K same-shape host batches into one [K, B, ...] pytree."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *batches)


def make_bn_refresh_fn(model, cfg: Config) -> Callable:
    """Forward-only BN running-stat refresh: (state, batch, rng) -> state.

    Runs the exact train-mode forward (on-device negative expansion +
    dropout + batch-stat BN) and keeps ONLY the updated batch_stats —
    no gradients, no optimizer.  Used by the length-bucketed epoch
    (trainer._bucketed_epoch) to re-estimate the BN running averages
    over bucket-INTERLEAVED batches before each eval: the K-step
    dispatch runs are bucket-homogeneous and longer than the
    momentum-0.95 EMA horizon, so the raw epoch-end stats reflect the
    last-visited bucket, not the mixture (docs/RESULTS_r5.md)."""
    num_ngs = cfg.train_num_ngs

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        rng_samp, rng_drop = jax.random.split(rng)
        if cfg.need_sample and num_ngs > 0:
            batch = expand_with_negatives(rng_samp, batch, num_ngs)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, mutated = state.apply_fn(
            variables, batch, train=True, rngs={"dropout": rng_drop},
            mutable=["batch_stats"])
        stats = mutated.get("batch_stats", state.batch_stats)
        if not stats:
            stats = state.batch_stats
        return state.replace(batch_stats=stats)

    return step


def make_eval_step_fn(model, cfg: Config,
                      allow_pallas: Optional[bool] = None) -> Callable:
    """The raw (unjitted) eval step: (state, batch) -> (preds, alpha).

    Eval mode: BN running stats, no dropout (base_model.py:366-392);
    preds = sigmoid(logit) for classification (base_model.py:89-109).

    `allow_pallas` gates the fused eval attention scorer
    (ops/pallas_attention.py); None defers to the config flag
    ('auto' = TPU backend only — on CPU the kernel exists only in slow
    interpret mode).  The mesh builders (parallel/mesh.py) also pass
    None and set the eval-mesh context, so the kernel runs per batch
    shard under shard_map (pallas_call itself has no GSPMD rule).
    """
    if allow_pallas is None:
        flag = cfg.use_pallas_eval_attention
        use_kernel = (flag == "on" or
                      (flag == "auto" and jax.default_backend() == "tpu"))
    else:
        use_kernel = allow_pallas

    def step(state: TrainState, batch: Batch):
        from clsr_tpu.ops.pallas_attention import use_eval_attention
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        with use_eval_attention(use_kernel):
            logits, aux = state.apply_fn(variables, batch, train=False)
        if cfg.method == "classification":
            preds = jax.nn.sigmoid(logits)
        else:
            preds = logits
        alpha = aux.get("alpha", jnp.zeros_like(preds))
        return preds, alpha

    return step


def make_eval_step(model, cfg: Config) -> Callable:
    """Jitted single-device eval step -> (preds [B,G], alpha [B,G])."""
    return jax.jit(make_eval_step_fn(model, cfg))


def _device_histogram(x: jnp.ndarray, nbins: int):
    """Fixed-bucket histogram on device
    -> (counts [nbins] i32, lo, hi, n_nonfinite).

    Buckets span the tensor's own finite [min, max] (the reference's
    tf.summary.histogram also buckets per-tensor, per-step); only
    nbins + 3 scalars ever cross the device->host link.  Non-finite
    values (exactly the divergence regime where histograms matter) are
    excluded from the range and the buckets and reported as a separate
    count, so lo/hi stay finite and the JSONL stays strict-parseable."""
    x = x.astype(jnp.float32).reshape(-1)
    finite = jnp.isfinite(x)
    n_nonfinite = jnp.sum(~finite)
    lo = jnp.min(jnp.where(finite, x, jnp.inf))
    hi = jnp.max(jnp.where(finite, x, -jnp.inf))
    # all-non-finite tensor: pin the (empty) range to [0, 0]
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((jnp.where(finite, x, lo) - lo) / span * nbins)
                   .astype(jnp.int32), 0, nbins - 1)
    counts = (jnp.zeros((nbins,), jnp.int32)
              .at[idx].add(finite.astype(jnp.int32)))
    return counts, lo, hi, n_nonfinite


def make_histogram_step(model, cfg: Config, nbins: int = 64) -> Callable:
    """Jitted activation-histogram step: (state, batch) -> {tag: (counts, lo, hi)}.

    TPU-native mirror of the reference's tf.summary.histogram stream
    (clsr.py:111,155,171,217,222,237,266,276;
    sequential_base_model.py:387-438).  Instead of shipping raw
    activation tensors host-side every step (multi-MB through the
    relay), the bucket COUNTS are computed on device and only
    [nbins]+2 scalars per tag are downloaded, at the summary cadence.

    Deviations from the reference, both deliberate: the forward runs in
    eval mode (running BN stats, no dropout) on a FIXED probe batch so
    distributions are comparable across steps, and embedding-output
    histograms cover every table the probe batch touches
    (lazy_adam.batch_table_ids) rather than the hand-picked five."""
    import flax.traverse_util as tu

    from clsr_tpu.training.lazy_adam import batch_table_ids

    # reference tag names where a 1:1 counterpart exists.  'model_output'
    # is the PRE-HEAD concat embedding (clsr.py:276), exposed via
    # aux["model_output"] (models/base.py); the post-head logits stream
    # under the extra tag 'logit' (no reference counterpart).
    aux_tags = (("alpha", "alpha"),
                ("att_fea_long", "att_fea_long"),
                ("att_fea_short", "att_fea2"),
                ("model_output", "model_output"))

    def step(state: TrainState, batch: Batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits, aux = state.apply_fn(variables, batch, train=False)
        hists = {"logit": _device_histogram(logits, nbins)}
        for key, tag in aux_tags:
            if key in aux:
                hists[tag] = _device_histogram(aux[key], nbins)
        ids = batch_table_ids(batch)
        for path, table in tu.flatten_dict(state.params).items():
            name = path[-1]
            if name in ids and table.ndim == 2:
                rows = jnp.take(table, ids[name].reshape(-1).astype(jnp.int32),
                                axis=0)
                hists[f"{name}_output"] = _device_histogram(rows, nbins)
        return hists

    return jax.jit(step)
