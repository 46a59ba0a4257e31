"""Multi-host bring-up.

The reference has no distributed machinery (SURVEY.md section 2.4).  On
TPU pods, multi-host coordination is `jax.distributed.initialize` — each
host sees its local chips, the mesh spans all of them, and XLA routes
collectives over ICI within a slice and DCN across slices.  No NCCL/MPI
equivalent is needed; the compiler owns the collectives.

Per-host data sharding: each host feeds only its shard of the global batch
(`host_batch_slice`), and `jax.make_array_from_process_local_data`
assembles the logically-global array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-op on single-process setups.

    On Cloud TPU the arguments are auto-detected from the environment;
    elsewhere pass coordinator_address="host:port", num_processes and
    process_id explicitly.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_batch_slice(global_rows: int) -> Tuple[int, int]:
    """[start, end) of the global batch this host should load."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_rows // n
    if global_rows % n:
        raise ValueError(
            f"global batch {global_rows} not divisible by {n} hosts")
    return i * per, (i + 1) * per


def global_batch_from_host_shards(host_batch, mesh, flat: bool = False):
    """Assemble a logically-global sharded Batch from per-host rows.

    flat=True shards the rows over BOTH mesh axes (flat data
    parallelism, parallel/embedding.py) — valid because the mesh's
    device array is process-major, so each host's contiguous row block
    lands on its own devices either way."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clsr_tpu.parallel.embedding import batch_axes

    sharding = NamedSharding(mesh, P(batch_axes(flat)))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        host_batch)


def global_state_from_replicas(state, mesh, shard_embeddings: bool = False):
    """Place an (identical-on-every-process) TrainState onto the global
    mesh: every process holds the full value of every leaf, so each
    sharding's global slice can be cut locally
    (jax.make_array_from_callback)."""
    from clsr_tpu.parallel.mesh import state_sharding

    shardings = state_sharding(state, mesh, shard_embeddings)

    def put(x, s):
        if hasattr(x, "shape"):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx])
        return x

    return jax.tree_util.tree_map(put, state, shardings,
                                  is_leaf=lambda x: x is None)
