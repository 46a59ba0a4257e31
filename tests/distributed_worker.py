"""Worker process for the multi-process distributed test.

Launched by tests/test_distributed_multiprocess.py as one of N processes:
initializes jax.distributed against a local coordinator, builds a global
mesh spanning every process's CPU devices, feeds ONLY this host's shard
of each global batch (parallel/distributed.py:host_batch_slice +
global_batch_from_host_shards), runs K sharded train steps, and writes
its loss trace to a JSON file for the parent to compare against a
single-process reference run.

Usage: python distributed_worker.py <coordinator_port> <num_procs> \
           <proc_id> <out_dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_global_batch(B, L, n_items, n_cates, n_users, seed):
    """Deterministic batch — identical on every process."""
    import numpy as np

    from clsr_tpu.data.batch import Batch
    rng = np.random.RandomState(seed)
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, n_users, B).astype(np.int32),
        items=rng.randint(1, n_items, (B, 1)).astype(np.int32),
        cates=rng.randint(1, n_cates, (B, 1)).astype(np.int32),
        labels=np.ones((B, 1), np.float32),
        item_hist=(rng.randint(1, n_items, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(1, n_cates, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32),
    )


def worker_config(n_data: int, mode: str = "dp"):
    """Tiny GRU4Rec config shared by the workers and the single-process
    reference run in the parent test.  mode='mesh_compact' switches to
    the full production machinery: row-sharded tables over a 2-wide
    'model' axis, lazyadam + mesh-compact/pmn, flat batch sharding."""
    from clsr_tpu.config import Config
    kw = {}
    if mode == "mesh_compact":
        kw = dict(optimizer="lazyadam", model_parallel=2,
                  embed_l2=1e-4, is_clip_norm=1, max_grad_norm=0.5)
    return Config(
        model_type="gru4rec", user_vocab="u", item_vocab="i",
        cate_vocab="c", item_embedding_dim=8, cate_embedding_dim=4,
        hidden_size=12, max_seq_length=8, batch_size=16, train_num_ngs=2,
        layer_sizes=(8,), activation=("relu",), enable_bn=False,
        seed=0, show_step=0, save_model=False,
        data_parallel=n_data, train_steps_per_call=1, **kw
    ).validate()


def run(num_procs: int, proc_id: int, port: int, out_dir: str,
        n_steps: int = 4, mode: str = "dp"):
    import jax
    jax.config.update("jax_platforms", "cpu")

    from clsr_tpu.parallel.distributed import (global_batch_from_host_shards,
                                               global_state_from_replicas,
                                               host_batch_slice,
                                               initialize_distributed)
    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    n_dev = len(jax.devices())

    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.parallel.mesh import make_mesh, make_sharded_train_step
    from clsr_tpu.training.state import create_train_state

    shard_emb = mode == "mesh_compact"
    flat = shard_emb
    n_model = 2 if shard_emb else 1
    cfg = worker_config(n_dev // n_model, mode)
    n_items, n_cates, n_users = 50, 10, 20
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    mesh = make_mesh(n_dev // n_model, n_model)

    B = cfg.batch_size
    sample = make_global_batch(B, cfg.max_seq_length, n_items, n_cates,
                               n_users, seed=0)
    state = create_train_state(model, cfg, sample)

    # every leaf is identical on every process, so each process can cut
    # any sharding's global slices locally.  In mesh_compact mode the
    # 2x2 mesh puts 'model' within each process (like ICI-local tensor
    # parallelism on a real pod) and 'data' across the process boundary
    # — the row-update's (ids, grads) all_gather and the dense psums
    # cross processes.
    gstate = global_state_from_replicas(state, mesh, shard_emb)
    step_fn = make_sharded_train_step(model, cfg, mesh, state,
                                      shard_embeddings=shard_emb,
                                      flat_batch=flat)

    losses = []
    for k in range(n_steps):
        gbatch = make_global_batch(B, cfg.max_seq_length, n_items, n_cates,
                                   n_users, seed=100 + k)
        lo, hi = host_batch_slice(B)
        host_shard = jax.tree_util.tree_map(lambda x: x[lo:hi], gbatch)
        sbatch = global_batch_from_host_shards(host_shard, mesh, flat=flat)
        gstate, parts = step_fn(gstate, sbatch, jax.random.PRNGKey(k))
        losses.append(float(jax.device_get(parts.loss)))

    with open(os.path.join(out_dir, f"loss_{proc_id}.json"), "w") as f:
        json.dump(losses, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    port, num_procs, proc_id = (int(a) for a in sys.argv[1:4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
    run(num_procs, proc_id, port, sys.argv[4], mode=mode)
