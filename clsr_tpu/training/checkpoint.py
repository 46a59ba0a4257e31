"""Checkpoint schema versioning, migration, and mid-epoch run state.

The reference's tf.train.Saver path is restore-for-eval only
(sequential.py:352-353; SURVEY §5 lists checkpoint/resume as an aux
subsystem the rebuild must beat it on).  This module adds the two
hardening pieces VERDICT r3 item 7 asked for:

1. **Schema versioning + migration** — every checkpoint directory gets
   a `clsr_meta.json` sidecar recording the state-tree schema version.
   Round 3 added `LazyAdamState.route_overflow` (lazy_adam.py), which
   silently broke restores of checkpoints saved before it existed;
   `restore_with_migration` now restores such legacy trees against a
   schema-1 template (the LazyAdamState fields as a plain dict, minus
   the new leaf) and fills every missing leaf from the freshly
   initialized template value, reporting what was defaulted.

2. **Run state for exact mid-epoch resume** — `save_run_state` /
   `load_run_state` persist everything the resident-path epoch loop
   needs to continue a killed run bit-for-bit: (epoch, completed call
   count, the jax PRNG key at the call boundary, the host RandomState
   internals, the epoch's permutation + call layout, step/loss
   accumulators, best-metric bookkeeping).  Trainer.fit(resume=True)
   consumes it (training/trainer.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

# schema history:
#   1  rounds 1-2: LazyAdamState(moments, count, dense_opt)
#   2  round 3+:   + route_overflow telemetry counter
SCHEMA_VERSION = 2
META_NAME = "clsr_meta.json"


def write_meta(path: str, extra: Optional[Dict[str, Any]] = None) -> None:
    meta = {"schema": SCHEMA_VERSION, "layout": "logical"}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump(meta, f)


def read_meta(path: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(path, META_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _legacy_v1_template(state):
    """The schema-1 view of a state tree: LazyAdamState serialized as a
    plain field dict WITHOUT route_overflow (the pre-round-3 layout —
    orbax keys by field name, so the nested names match)."""
    from clsr_tpu.training.lazy_adam import LazyAdamState

    if isinstance(state.opt_state, LazyAdamState):
        os_ = state.opt_state
        return state.replace(opt_state={
            "moments": os_.moments, "count": os_.count,
            "dense_opt": os_.dense_opt})
    return state


def _from_legacy_v1(restored, template):
    """Rebuild the current typed state from a schema-1 restore; missing
    leaves keep the template's freshly-initialized values."""
    from clsr_tpu.training.lazy_adam import LazyAdamState

    if isinstance(template.opt_state, LazyAdamState):
        d = restored.opt_state
        opt = LazyAdamState(
            moments=d["moments"], count=d["count"],
            dense_opt=d["dense_opt"],
            route_overflow=template.opt_state.route_overflow)
        return restored.replace(opt_state=opt), ["opt_state.route_overflow"]
    return restored, []


def restore_with_migration(ckpt, path: str, template
                           ) -> Tuple[Any, list]:
    """Restore `path` into `template`'s structure, migrating legacy
    schemas.  Returns (state, list of leaf names that were defaulted
    from the template because the checkpoint predates them)."""
    meta = read_meta(path)
    schema = meta["schema"] if meta else None
    if schema == SCHEMA_VERSION:
        return ckpt.restore(path, template), []
    if schema is None:
        # pre-versioning checkpoint: could be schema 1 (pre-r3) or an
        # unversioned schema 2 (round 3 wrote no meta) — try current
        # first, fall back to the legacy template
        try:
            return ckpt.restore(path, template), []
        except Exception:
            pass
    restored = ckpt.restore(path, _legacy_v1_template(template))
    return _from_legacy_v1(restored, template)


# ---------------------------------------------------------------- run state

RUN_NAME = "run_state.npz"


def save_run_state(path: str, *, epoch: int, calls_done: int, step: int,
                   rng, np_rng: np.random.RandomState, perm: np.ndarray,
                   n_use: int, n_calls: int, n_tail: int,
                   total: float, data_total: float,
                   best_metric: float, best_epoch: int,
                   mode: str = "resident") -> None:
    """Persist the epoch-loop position (see module docstring).  `rng` is
    the jax key AS OF the completed-call boundary.

    mode='resident' (default): `np_rng` has already drawn this epoch's
    permutation, so its state is correct for every FUTURE epoch; the
    current epoch's permutation is saved verbatim.

    mode='stream' (round 5, VERDICT r4 item 7): the streaming loaders
    draw their permutation INSIDE the epoch iterator, so `np_rng` must
    carry the EPOCH-START state — resume regenerates the identical
    iterator and skips the first `calls_done` items host-side (no device
    work); perm/n_use/n_tail are unused."""
    os.makedirs(path, exist_ok=True)
    mt = np_rng.get_state()      # ('MT19937', keys[624], pos, has_g, g)
    np.savez(
        os.path.join(path, RUN_NAME),
        epoch=np.int64(epoch), calls_done=np.int64(calls_done),
        step=np.int64(step),
        rng=np.asarray(rng),   # old-style uint32[2] key (codebase-wide)
        perm=perm, n_use=np.int64(n_use), n_calls=np.int64(n_calls),
        n_tail=np.int64(n_tail),
        total=np.float32(total), data_total=np.float32(data_total),
        best_metric=np.float64(best_metric), best_epoch=np.int64(best_epoch),
        mt_keys=mt[1], mt_pos=np.int64(mt[2]),
        mt_has_gauss=np.int64(mt[3]), mt_gauss=np.float64(mt[4]),
        mode=np.bytes_(mode.encode()),
    )


def load_run_state(path: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(path, RUN_NAME)
    if not os.path.exists(p):
        return None
    z = np.load(p)
    np_rng = np.random.RandomState(0)
    np_rng.set_state(("MT19937", z["mt_keys"], int(z["mt_pos"]),
                      int(z["mt_has_gauss"]), float(z["mt_gauss"])))
    rng = jax.numpy.asarray(z["rng"])
    return dict(
        epoch=int(z["epoch"]), calls_done=int(z["calls_done"]),
        step=int(z["step"]), rng=rng, np_rng=np_rng,
        perm=z["perm"], n_use=int(z["n_use"]), n_calls=int(z["n_calls"]),
        n_tail=int(z["n_tail"]), total=float(z["total"]),
        data_total=float(z["data_total"]),
        best_metric=float(z["best_metric"]),
        best_epoch=int(z["best_epoch"]),
        mode=(bytes(z["mode"]).decode() if "mode" in z.files
              else "resident"),
    )
