"""Multi-process multi-host execution (parallel/distributed.py).

SURVEY.md section 4 calls for multi-host tests via JAX's portable
runtime: this spawns N OS processes, each with 2 virtual CPU devices,
coordinated through jax.distributed.initialize on localhost — a real
N-host bring-up (global mesh of 2N devices, per-host batch shards
assembled with make_array_from_process_local_data, psum gradient
reduction across the process boundary).  The loss trace must match a
single-process run of the same program on the same number of devices.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, mode, n_procs):
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_NUM_CPU_DEVICES="2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(n_procs), str(i),
             str(tmp_path), mode],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"

    losses = []
    for i in range(n_procs):
        with open(tmp_path / f"loss_{i}.json") as f:
            losses.append(json.load(f))
    # every process observes the same (replicated) loss
    for i in range(1, n_procs):
        np.testing.assert_allclose(losses[0], losses[i], rtol=1e-6)
    return losses[0]


def _reference_losses(mode, n_devices, n_steps):
    """Single-process run on n_devices of this process's virtual CPUs."""
    import jax

    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                        place_state, shard_batch)
    from clsr_tpu.training.state import create_train_state
    from tests.distributed_worker import make_global_batch, worker_config

    shard_emb = mode == "mesh_compact"
    flat = shard_emb
    n_model = 2 if shard_emb else 1
    cfg = worker_config(n_data=n_devices // n_model, mode=mode)
    n_items, n_cates, n_users = 50, 10, 20
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    mesh = make_mesh(n_devices // n_model, n_model,
                     devices=jax.devices("cpu")[:n_devices])
    sample = make_global_batch(16, cfg.max_seq_length, n_items, n_cates,
                               n_users, seed=0)
    state = create_train_state(model, cfg, sample)
    sstate = place_state(state, mesh, shard_emb)
    step_fn = make_sharded_train_step(model, cfg, mesh, state, shard_emb,
                                      flat)
    ref = []
    for k in range(n_steps):
        batch = make_global_batch(16, cfg.max_seq_length, n_items, n_cates,
                                  n_users, seed=100 + k)
        sstate, parts = step_fn(sstate, shard_batch(batch, mesh, flat),
                                jax.random.PRNGKey(k))
        ref.append(float(jax.device_get(parts.loss)))
    return ref


@pytest.mark.parametrize("mode", ["dp", "mesh_compact"])
def test_two_process_training_matches_single_process(tmp_path, mode):
    """mode='dp': replicated params, psum over the process boundary.
    mode='mesh_compact': the production machinery — row-sharded tables
    (pmn) on a 2x2 mesh, lazyadam mesh-compact updates, flat batch —
    with 'data' crossing the process boundary."""
    losses = _run_workers(tmp_path, mode, n_procs=2)
    ref = _reference_losses(mode, n_devices=4, n_steps=len(losses))
    np.testing.assert_allclose(losses, ref, rtol=1e-5, atol=1e-6)


def test_four_process_mesh_compact_matches_single_process(tmp_path):
    """VERDICT r2 item 7: 4 processes x 2 devices = an 8-device global
    4x2 mesh running the full flat-batch mesh-compact configuration —
    the exact topology dryrun_multichip simulates, across real process
    boundaries — must match a single-process 8-device run."""
    losses = _run_workers(tmp_path, "mesh_compact", n_procs=4)
    ref = _reference_losses("mesh_compact", n_devices=8,
                            n_steps=len(losses))
    np.testing.assert_allclose(losses, ref, rtol=1e-5, atol=1e-6)
