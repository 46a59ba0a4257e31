"""HLO collective-byte accounting validation (VERDICT r3 item 4;
utils/hlo_bytes.py + scripts/scaling_model.py).

Guarantees:
  * axis classification against the (data, model) device order;
  * the extracted update-merge all-gather payload matches the ANALYTIC
    formula from docs/SCALING.md (M x 4(1+D) bytes for the (id, grad)
    stream) exactly — the scaling model's numbers are the compiled
    program's, not hand-math;
  * collective payloads scale linearly with per-device batch rows (the
    rescaling assumption scripts/scaling_model.py relies on);
  * the owner-routed program moves fewer unconditional bytes than the
    broadcast program at the same topology.
"""

import jax
import numpy as np
import pytest

from clsr_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    make_sharded_train_step,
                                    state_sharding)
from clsr_tpu.utils.hlo_bytes import (classify_axis, collect_collectives,
                                      summarize)
from tests.test_lazy_adam import _batch
from tests.test_mesh_compact import N_CATES, N_ITEMS, N_USERS, _build, _cfg


def test_classify_axis():
    # mesh 4x2, data-major: model groups consecutive pairs, data groups
    # stride-2 columns
    assert classify_axis([0, 1], 4, 2) == "model"
    assert classify_axis([6, 7], 4, 2) == "model"
    assert classify_axis([0, 2, 4, 6], 4, 2) == "data"
    assert classify_axis([1, 3, 5, 7], 4, 2) == "data"
    assert classify_axis(list(range(8)), 4, 2) == "both"
    assert classify_axis([0, 3], 4, 2) == "unknown"


def _compiled_colls(cfg, batch, d, m, flat):
    mesh = make_mesh(d, m)
    model, state = _build("gru4rec", cfg, batch)
    step = make_sharded_train_step(model, cfg, mesh, state, True, flat)
    st_sds = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                          np.asarray(x).dtype, sharding=s),
        state, state_sharding(state, mesh, True),
        is_leaf=lambda x: x is None)
    b_sds = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                          np.asarray(x).dtype, sharding=s),
        batch, batch_sharding(mesh, flat))
    txt = step.lower(st_sds, b_sds,
                     jax.ShapeDtypeStruct((2,), np.uint32)
                     ).compile().as_text()
    return collect_collectives(txt, d, m)


def test_merge_all_gather_matches_analytic():
    """The broadcast merge's gradient all-gather payload must equal the
    docs/SCALING.md formula: the full per-step w-space gradient stream
    f32[n_shards, Mi, D] (4*D bytes per occurrence id)."""
    rng = np.random.RandomState(0)
    batch = _batch(rng, N_ITEMS, N_CATES, N_USERS)   # B=16, L=6, G=3
    d, m = 4, 2
    cfg = _cfg("gru4rec", dp=d, mp=m, mesh_flat_batch="on")
    colls = _compiled_colls(cfg, batch, d, m, True)

    n_shards = d * m
    b_loc = 16 // n_shards
    mi = b_loc * (6 + 3)            # hist L=6 + (1+ngs)=3 targets
    D = 8                           # item embedding dim
    expect = n_shards * mi * D * 4  # f32[n, Mi, D] all-gather payload
    ag = [c for c in colls if c.op == "all-gather"
          and c.payload == expect and not c.in_cond]
    assert ag, [(c.op, c.payload) for c in colls]
    # its ring cost: (g-1)/g * payload received per device
    assert ag[0].per_device_bytes == pytest.approx(
        expect * (n_shards - 1) / n_shards)


def _mk_batch(rng, B, L=6):
    from clsr_tpu.data.batch import Batch
    lengths = rng.randint(1, L + 1, B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    return Batch(
        users=rng.randint(0, N_USERS, B).astype(np.int32),
        items=rng.randint(0, N_ITEMS, (B, 1)).astype(np.int32),
        cates=rng.randint(0, N_CATES, (B, 1)).astype(np.int32),
        labels=np.ones((B, 1), np.float32),
        item_hist=(rng.randint(1, N_ITEMS, (B, L)) * mask).astype(np.int32),
        cate_hist=(rng.randint(1, N_CATES, (B, L)) * mask).astype(np.int32),
        mask=mask,
        time_diff=(rng.rand(B, L) * mask).astype(np.float32),
        time_from_first=(rng.rand(B, L) * mask).astype(np.float32),
        time_to_now=(rng.rand(B, L) * mask).astype(np.float32),
        valid=np.ones(B, np.float32))


def test_bytes_scale_linearly_with_batch():
    """scripts/scaling_model.py compiles at a small per-device batch
    and rescales linearly — verify the non-loop collective total really
    is linear in B (within 10%: a few fixed-size scalar psums)."""
    rng = np.random.RandomState(0)
    d, m = 4, 2
    totals = {}
    for B in (16, 32):
        batch = _mk_batch(rng, B)
        cfg = _cfg("gru4rec", dp=d, mp=m, mesh_flat_batch="on",
                   batch_size=B)
        colls = _compiled_colls(cfg, batch, d, m, True)
        totals[B] = summarize(colls, loop_multiplier=1)["total"]
    ratio = totals[32] / totals[16]
    assert 1.8 <= ratio <= 2.2, totals


def test_owner_routing_moves_fewer_bytes():
    rng = np.random.RandomState(0)
    batch = _batch(rng, N_ITEMS, N_CATES, N_USERS)
    d, m = 4, 2
    kw = dict(dp=d, mp=m, mesh_flat_batch="on")
    colls_b = _compiled_colls(_cfg("gru4rec", **kw), batch, d, m, True)
    colls_o = _compiled_colls(
        _cfg("gru4rec", mesh_update_routing="owner",
             mesh_owner_capacity=1.0, mesh_owner_overflow="drop", **kw),
        batch, d, m, True)
    tb = summarize(colls_b, loop_multiplier=1)["total"]
    to = summarize(colls_o, loop_multiplier=1)["total"]
    assert to < tb, (to, tb)


def test_model_within_host_moves_bytes_onto_ici():
    """The round-5 8-chip mitigation (docs/SCALING.md): turning the mesh
    so the MODEL axis is the within-host axis (2x4 vs 4x2) must shift
    wire bytes from the cross-host axis classification ('data'/'both')
    onto 'model' — the basis of the >=90%-at-8-chips prediction."""
    rng = np.random.RandomState(0)
    batch = _batch(rng, N_ITEMS, N_CATES, N_USERS)
    kw = dict(mesh_flat_batch="on", mesh_update_routing="owner",
              mesh_owner_capacity=1.0, mesh_owner_overflow="drop")

    def split(d, m):
        colls = _compiled_colls(_cfg("gru4rec", dp=d, mp=m, **kw),
                                batch, d, m, True)
        s = summarize(colls, loop_multiplier=1)
        cross = (s.get("axis/data", 0.0) + s.get("axis/both", 0.0)
                 + s.get("axis/unknown", 0.0))
        return s.get("axis/model", 0.0), cross

    m42_model, m42_cross = split(4, 2)
    m24_model, m24_cross = split(2, 4)
    assert m24_cross < m42_cross, (m24_cross, m42_cross)
    assert m24_model > m42_model, (m24_model, m42_model)
