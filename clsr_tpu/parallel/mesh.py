"""Mesh & sharding runtime.

The reference has NO distributed machinery (single TF session, one device —
SURVEY.md section 2.4); this module is the TPU-native addition: a
(data, model) `jax.sharding.Mesh`, with

  * batch leaves sharded over the `data` axis (pure data parallelism for
    the dense towers — the GRU/Time4LSTM scans, attention and MLPs are
    embarrassingly parallel over rows),
  * embedding tables optionally ROW-SHARDED over the `model` axis (the
    Kuaishou-scale configuration: large item vocab split across devices;
    XLA GSPMD turns the gathers into collective lookups),
  * all other params replicated; gradient reduction happens via the
    collectives XLA inserts (psum over `data`) — the TPU answer to NCCL.

Works identically on a real multi-chip slice and on the virtual CPU mesh
(xla_force_host_platform_device_count) used by tests and the driver's
dry-run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.training.state import TrainState


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_data is None:
        n_data = n_dev // n_model
    if n_data * n_model != n_dev:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n_dev} devices")
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def resolve_flat_batch(cfg: Config, pads_rows: bool = False) -> bool:
    """The ONE flat-batch enablement rule (config `mesh_flat_batch`):
    'on' forces it (validate() already checked divisibility), 'auto'
    turns it on when tables are sharded (model_parallel > 1) and the
    batch rows divide d*m — callers that pad request rows to a multiple
    themselves (serving) pass pads_rows=True."""
    if cfg.mesh_flat_batch == "off":
        return False
    shard_emb = cfg.model_parallel > 1
    n_dev = cfg.data_parallel * cfg.model_parallel
    if cfg.mesh_flat_batch == "on":
        return True
    return shard_emb and (pads_rows or cfg.batch_size % n_dev == 0)


def batch_sharding(mesh: Mesh, flat: bool = False) -> Batch:
    """A Batch-shaped pytree of NamedShardings: all leaves sharded on
    rows — over 'data' only, or over BOTH axes (flat data parallelism,
    parallel/embedding.py docstring) when flat."""
    from clsr_tpu.parallel.embedding import batch_axes
    row = NamedSharding(mesh, P(batch_axes(flat)))
    return jax.tree_util.tree_map(lambda _: row, Batch(
        users=0, items=0, cates=0, labels=0, item_hist=0, cate_hist=0,
        mask=0, time_diff=0, time_from_first=0, time_to_now=0, valid=0))


def shard_batch(batch: Batch, mesh: Mesh, flat: bool = False) -> Batch:
    shardings = batch_sharding(mesh, flat)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(np.asarray(x), s), batch, shardings)


def _param_spec(path_tuple, leaf, shard_embeddings: bool,
                n_model: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path_tuple]
    if (shard_embeddings and names
            and str(names[-1]).endswith("_embedding")
            and hasattr(leaf, "shape")
            and leaf.shape[0] % n_model == 0):
        return P("model", None)   # row-shard the big tables
    return P()                    # replicate dense params


def state_sharding(state: TrainState, mesh: Mesh,
                   shard_embeddings: bool = False):
    """NamedSharding pytree for a TrainState.

    Optimizer-state leaves mirror their parameter's sharding (adam moments
    have the param's shape); scalar counters are replicated.
    """

    n_model = mesh.shape["model"]

    def spec_for_params(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        specs = [
            NamedSharding(mesh,
                          _param_spec(path, leaf, shard_embeddings, n_model))
            for path, leaf in flat
        ]
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(treedef, specs)

    param_specs = spec_for_params(state.params)

    # opt_state: any leaf whose shape matches a (row-shardable) table —
    # or its fused [N, 2D] Adam moment array (lazy_adam.LazyAdamState) —
    # gets the table's row sharding; everything else replicated.
    table_shapes = set()
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        names = [getattr(p, "key", str(p)) for p in path]
        if (shard_embeddings and str(names[-1]).endswith("_embedding")
                and leaf.shape[0] % n_model == 0):
            table_shapes.add(leaf.shape)
            table_shapes.add((leaf.shape[0], 2 * leaf.shape[1]))
            table_shapes.add((leaf.shape[0], 3 * leaf.shape[1]))

    def opt_spec(leaf):
        if hasattr(leaf, "shape") and leaf.shape in table_shapes:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    opt_specs = jax.tree_util.tree_map(opt_spec, state.opt_state)
    replicated = NamedSharding(mesh, P())
    stats_specs = jax.tree_util.tree_map(lambda _: replicated,
                                         state.batch_stats)
    return state.replace(
        step=replicated, params=param_specs, opt_state=opt_specs,
        batch_stats=stats_specs)


def place_state(state: TrainState, mesh: Mesh,
                shard_embeddings: bool = False,
                cfg: Optional[Config] = None) -> TrainState:
    """Place a host TrainState onto the mesh.

    `cfg` resolves the physical row layout (parallel/rowmap.py): with
    mesh_row_layout interleaved (the 'auto' default under owner
    routing), row-sharded leaves are transposed host-side so logical
    row i lands on shard i % m — every step builder resolves the same
    flag from the same cfg, so placement and id->row mapping agree.
    """
    from clsr_tpu.parallel.rowmap import (permute_state_rows,
                                          resolve_interleaved)
    if resolve_interleaved(cfg) and shard_embeddings:
        state = permute_state_rows(state, mesh, shard_embeddings,
                                   to_physical=True)
    shardings = state_sharding(state, mesh, shard_embeddings)

    # The sharded copy must not share buffers with the source state: the
    # sharded train step donates its input, and an aliased shard would
    # delete the caller's arrays with it.  The CPU backend aliases the
    # source into device_put results even with may_alias=False, so route
    # through a host copy (one-time setup cost).
    def put(x, s):
        if hasattr(x, "shape"):
            x = np.asarray(x)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, state, shardings,
                                  is_leaf=lambda x: x is None)


def make_sharded_train_step(model, cfg: Config, mesh: Mesh,
                            state: TrainState,
                            shard_embeddings: bool = False,
                            flat_batch: bool = False):
    """Jit the train step with explicit in/out shardings over the mesh.

    With shard_embeddings, tracing runs under `use_sharded_tables(mesh)`
    so every table lookup and the LazyAdam row update go through the
    explicit shard_map collectives (parallel/embedding.py) instead of
    GSPMD's full-table all-gather formulation.
    """
    from clsr_tpu.parallel.embedding import use_sharded_tables
    from clsr_tpu.parallel.rowmap import resolve_interleaved
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)
    from clsr_tpu.training.losses import LossParts

    # allow_pallas=None defers to cfg.use_pallas_train_attention: on a
    # mesh the train kernel reaches the GSPMD program through the
    # shard_map island (pallas_attention.fused_train_attention_mesh)
    # with GLOBAL batch-BN psums — never as a bare pallas_call.
    from clsr_tpu.ops.pallas_attention import use_train_attention_mesh
    raw_inner = make_train_step_fn(model, cfg, allow_pallas=None)
    il = resolve_interleaved(cfg)

    def raw(state, batch, rng):
        with use_sharded_tables(mesh if shard_embeddings else None,
                                flat_batch, il), \
             use_train_attention_mesh(mesh, flat_batch):
            state, parts = raw_inner(state, batch, rng)
        # pmn fused layout: params tables are a lagging view, refreshed
        # at the jit boundary (shard-local slice of the [N, 3D] rows)
        return sync_params_from_opt(state), parts

    st_shard = state_sharding(state, mesh, shard_embeddings)
    b_shard = batch_sharding(mesh, flat_batch)
    replicated = NamedSharding(mesh, P())
    parts_shard = LossParts(loss=replicated, data_loss=replicated,
                            regular_loss=replicated,
                            contrastive_loss=replicated,
                            discrepancy_loss=replicated)

    return jax.jit(
        raw,
        in_shardings=(st_shard, b_shard, replicated),
        out_shardings=(st_shard, parts_shard),
        donate_argnums=(0,),
    )


def make_sharded_multi_train_step(model, cfg: Config, mesh: Mesh,
                                  state: TrainState, steps_per_call: int,
                                  shard_embeddings: bool = False,
                                  flat_batch: bool = False):
    """K sharded train steps per dispatch: lax.scan over a [K, B, ...]
    stacked batch whose row axis is sharded over 'data'.  Composes the
    dispatch amortization of make_multi_train_step with the mesh."""
    import jax.numpy as jnp

    from clsr_tpu.parallel.embedding import use_sharded_tables
    from clsr_tpu.parallel.rowmap import resolve_interleaved
    from clsr_tpu.training.steps import (make_train_step_fn,
                                         sync_params_from_opt)

    from clsr_tpu.ops.pallas_attention import use_train_attention_mesh
    raw = make_train_step_fn(model, cfg, allow_pallas=None)
    il = resolve_interleaved(cfg)

    def multi(st, batches, rng):
        def body(s, inp):
            i, batch = inp
            return raw(s, batch, jax.random.fold_in(rng, i))

        idx = jnp.arange(steps_per_call)
        with use_sharded_tables(mesh if shard_embeddings else None,
                                flat_batch, il), \
             use_train_attention_mesh(mesh, flat_batch):
            st, parts = jax.lax.scan(body, st, (idx, batches))
        # pmn fused layout: refresh the lagging params tables once per
        # dispatch (see steps.sync_params_from_opt)
        return sync_params_from_opt(st), parts

    from clsr_tpu.parallel.embedding import batch_axes
    st_shard = state_sharding(state, mesh, shard_embeddings)
    # stacked batches: [K, B, ...] with rows sharded over the batch axes
    stacked_b = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, P(None, batch_axes(flat_batch))),
        batch_sharding(mesh))
    replicated = NamedSharding(mesh, P())
    from clsr_tpu.training.losses import LossParts
    parts_shard = LossParts(loss=replicated, data_loss=replicated,
                            regular_loss=replicated,
                            contrastive_loss=replicated,
                            discrepancy_loss=replicated)

    return jax.jit(
        multi,
        in_shardings=(st_shard, stacked_b, replicated),
        out_shardings=(st_shard, parts_shard),
        donate_argnums=(0,),
    )


def make_sharded_eval_step(model, cfg: Config, mesh: Mesh,
                           state: TrainState,
                           shard_embeddings: bool = False,
                           flat_batch: bool = False):
    """Jitted eval step over the mesh (collective table lookups when
    shard_embeddings)."""
    from clsr_tpu.parallel.embedding import batch_axes, use_sharded_tables
    from clsr_tpu.training.steps import make_eval_step_fn

    # allow_pallas=None defers to the config flag: the kernel reaches
    # the mesh through the shard_map wrapper in ops/attention.py
    # (pallas_attention.fused_eval_attention_mesh), so 'auto'/'on'
    # carries the 4.4x fused scorer to sharded eval and serving.  The
    # eval-mesh context is set for EVERY mesh trace — also
    # data-parallel-only meshes (shard_embeddings False), where the
    # table context is None but a bare pallas_call would still land in
    # a GSPMD program with sharded batch operands.
    from clsr_tpu.ops.pallas_attention import use_eval_attention_mesh
    from clsr_tpu.parallel.rowmap import resolve_interleaved
    raw_inner = make_eval_step_fn(model, cfg, allow_pallas=None)
    il = resolve_interleaved(cfg)

    def raw(st, batch):
        with use_sharded_tables(mesh if shard_embeddings else None,
                                flat_batch, il), \
             use_eval_attention_mesh(mesh, flat_batch):
            return raw_inner(st, batch)

    st_shard = state_sharding(state, mesh, shard_embeddings)
    b_shard = batch_sharding(mesh, flat_batch)
    out = NamedSharding(mesh, P(batch_axes(flat_batch)))
    return jax.jit(raw, in_shardings=(st_shard, b_shard),
                   out_shardings=(out, out))


def shard_stacked_batches(batches, mesh: Mesh, flat: bool = False):
    """Stack K host batches and place with [K, B(batch axes), ...]
    sharding."""
    from clsr_tpu.parallel.embedding import batch_axes
    from clsr_tpu.training.steps import stack_batches

    stacked = stack_batches(batches)
    sharding = NamedSharding(mesh, P(None, batch_axes(flat)))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), stacked)
