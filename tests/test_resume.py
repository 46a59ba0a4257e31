"""Checkpoint schema versioning + exact mid-epoch resume (VERDICT r3
item 7; training/checkpoint.py).

Guarantees:
  * a run killed MID-EPOCH (between train dispatches) and resumed via
    Trainer.fit(resume=True) reproduces the uninterrupted run
    bit-for-bit on the resident path: identical per-epoch valid
    metrics from the resume point on, identical best epoch, identical
    final parameters;
  * checkpoints written before the round-3 `route_overflow` leaf
    (schema 1) restore through the migration shim: present leaves keep
    their saved values, the new leaf gets its initial value, and the
    trainer reports the migration;
  * current checkpoints carry a schema sidecar (clsr_meta.json);
  * autosave without model_dir is rejected at config validation.
"""

import os

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.trainer import Trainer


def _setup(tmp_path, name, **cfg_kw):
    ds = str(tmp_path / "ds")
    if not os.path.exists(os.path.join(ds, "train_data")):
        write_synthetic_dataset(ds, n_users=60, n_items=120, n_cates=12,
                                valid_num_ngs=4, test_num_ngs=4, seed=3)
    paths = {n: os.path.join(ds, f"{n}_data")
             for n in ("train", "valid", "test")}
    paths.update({f"{n}_vocab": os.path.join(ds, f"{n}_vocab.pkl")
                  for n in ("user", "item", "cate")})
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    base = dict(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=10, batch_size=32, train_num_ngs=2, valid_num_ngs=4,
        hidden_size=12, item_embedding_dim=8, cate_embedding_dim=4,
        user_embedding_dim=12, att_fcn_layer_sizes=(8,), layer_sizes=(8,),
        activation=("relu",), epochs=3, early_stop=0, show_step=0,
        save_model=True, model_dir=str(tmp_path / name), seed=5,
        optimizer="lazyadam", resident_data="on", train_steps_per_call=2,
        contrastive_length_threshold=1,
    )
    base.update(cfg_kw)
    cfg = Config(**base).validate()
    loaders = {n: SequenceLoader(parse_file(paths[n], uv, iv, cv),
                                 cfg.max_seq_length)
               for n in ("train", "valid")}
    model = get_model_class("clsr")(
        cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    logs = []
    tr = Trainer(model, cfg, sample,
                 log=lambda *a: logs.append(" ".join(map(str, a))))
    return tr, loaders, logs


def _params_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, x), (pb, y) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=str(pa))


@pytest.mark.slow
def test_kill_and_resume_bit_identical(tmp_path):
    # A: the uninterrupted run (autosave on, never killed — autosave
    # only reads state, so it cannot perturb the trajectory)
    tr_a, loaders, _ = _setup(tmp_path, "a", autosave_every_calls=1)
    tr_a.fit(loaders["train"], loaders["valid"])
    hist_a = [(e, m["wauc"], m["auc"]) for e, m in tr_a.eval_history]
    assert not os.path.exists(os.path.join(tr_a.cfg.model_dir,
                                           "autosave")), \
        "completed fit must clear its autosave"

    # B: same run, killed mid-epoch after the 4th autosave
    tr_b, loaders_b, _ = _setup(tmp_path, "b", autosave_every_calls=1)
    orig = tr_b._autosave
    count = {"n": 0}

    def boom(*a, **kw):
        orig(*a, **kw)
        count["n"] += 1
        if count["n"] >= 4:
            raise KeyboardInterrupt   # simulated kill AFTER an autosave

    tr_b._autosave = boom
    with pytest.raises(KeyboardInterrupt):
        tr_b.fit(loaders_b["train"], loaders_b["valid"])

    # C: fresh process (fresh trainer), resume from B's autosave
    tr_c, loaders_c, logs_c = _setup(tmp_path, "b",
                                     autosave_every_calls=1)
    tr_c.fit(loaders_c["train"], loaders_c["valid"], resume=True)
    assert any("resuming at epoch" in l for l in logs_c)

    hist_c = [(e, m["wauc"], m["auc"]) for e, m in tr_c.eval_history]
    # every epoch C evaluated must match A's record exactly
    a_by_epoch = {e: (w, au) for e, w, au in hist_a}
    assert hist_c, "resumed run evaluated nothing"
    for e, w, au in hist_c:
        assert a_by_epoch[e] == (w, au), (e, w, au, a_by_epoch[e])
    assert tr_c.best_epoch == tr_a.best_epoch
    _params_equal(jax.device_get(tr_a.state).params,
                  jax.device_get(tr_c.state).params)


@pytest.mark.slow
def test_resume_without_autosave_starts_fresh(tmp_path):
    tr, loaders, logs = _setup(tmp_path, "fresh", epochs=1)
    tr.fit(loaders["train"], loaders["valid"], resume=True)
    assert any("no autosave found" in l for l in logs)
    assert tr.eval_history


def test_schema_sidecar_written_and_migration(tmp_path):
    """A schema-1 checkpoint (pre-round-3: LazyAdamState without
    route_overflow, saved as its raw field dict with no meta sidecar)
    loads through the migration shim."""
    import orbax.checkpoint as ocp

    from clsr_tpu.training.checkpoint import META_NAME, read_meta

    tr, loaders, logs = _setup(tmp_path, "mig", epochs=1)
    tr.fit(loaders["train"], loaders["valid"])
    # current checkpoints carry the schema sidecar
    ckdir = tr.cfg.model_dir
    ep = [d for d in os.listdir(ckdir) if d.startswith("epoch_")][0]
    assert read_meta(os.path.join(ckdir, ep)) is not None

    # forge a legacy (schema-1) checkpoint from the live state
    host = jax.device_get(tr.state)
    os_ = host.opt_state
    legacy = host.replace(opt_state={
        "moments": os_.moments, "count": os_.count,
        "dense_opt": os_.dense_opt})
    legacy_path = str(tmp_path / "legacy_ck")
    ck = ocp.StandardCheckpointer()
    ck.save(legacy_path, legacy, force=True)
    ck.wait_until_finished()
    assert not os.path.exists(os.path.join(legacy_path, META_NAME))

    # a fresh trainer restores it: migrated leaf = initial value,
    # present leaves = saved values, and the migration is reported
    tr2, _, logs2 = _setup(tmp_path, "mig2", epochs=1)
    tr2.load(legacy_path)
    assert any("migrated with initial values" in l for l in logs2)
    st2 = jax.device_get(tr2.state)
    assert int(np.asarray(st2.opt_state.route_overflow)) == 0
    assert int(np.asarray(st2.opt_state.count)) == \
        int(np.asarray(os_.count))
    _params_equal(host.params, st2.params)


def test_autosave_requires_model_dir():
    with pytest.raises(ValueError, match="model_dir"):
        Config(model_type="gru4rec", user_vocab="u", item_vocab="i",
               cate_vocab="c", max_seq_length=8, batch_size=16,
               train_num_ngs=2, autosave_every_calls=5,
               model_dir="").validate()


@pytest.mark.slow
def test_streaming_kill_and_resume_bit_identical(tmp_path):
    """VERDICT r4 item 7: the streaming (non-resident) path gets the
    same kill-and-resume guarantee — the autosave stores the epoch-START
    host-rng state, resume regenerates the identical epoch iterator and
    skips the completed items host-side."""
    kw = dict(autosave_every_calls=1, resident_data="off")
    tr_a, loaders, _ = _setup(tmp_path, "sa", **kw)
    tr_a.fit(loaders["train"], loaders["valid"])
    hist_a = [(e, m["wauc"], m["auc"]) for e, m in tr_a.eval_history]
    assert not os.path.exists(os.path.join(tr_a.cfg.model_dir,
                                           "autosave"))

    tr_b, loaders_b, _ = _setup(tmp_path, "sb", **kw)
    orig = tr_b._autosave_stream
    count = {"n": 0}

    def boom(*a, **kw2):
        orig(*a, **kw2)
        count["n"] += 1
        if count["n"] >= 4:
            raise KeyboardInterrupt   # simulated kill AFTER an autosave

    tr_b._autosave_stream = boom
    with pytest.raises(KeyboardInterrupt):
        tr_b.fit(loaders_b["train"], loaders_b["valid"])

    tr_c, loaders_c, logs_c = _setup(tmp_path, "sb", **kw)
    tr_c.fit(loaders_c["train"], loaders_c["valid"], resume=True)
    assert any("resuming at epoch" in l for l in logs_c)

    hist_c = [(e, m["wauc"], m["auc"]) for e, m in tr_c.eval_history]
    a_by_epoch = {e: (w, au) for e, w, au in hist_a}
    assert hist_c, "resumed run evaluated nothing"
    for e, w, au in hist_c:
        assert a_by_epoch[e] == (w, au), (e, w, au, a_by_epoch[e])
    assert tr_c.best_epoch == tr_a.best_epoch
    _params_equal(jax.device_get(tr_a.state).params,
                  jax.device_get(tr_c.state).params)


def test_resume_mode_mismatch_raises(tmp_path):
    """A streaming autosave must not resume into a resident run (and
    vice versa) — the permutation semantics differ."""
    tr_b, loaders_b, _ = _setup(tmp_path, "mm", autosave_every_calls=1,
                                resident_data="off", epochs=1)
    orig = tr_b._autosave_stream

    def boom(*a, **kw2):
        orig(*a, **kw2)
        raise KeyboardInterrupt

    tr_b._autosave_stream = boom
    with pytest.raises(KeyboardInterrupt):
        tr_b.fit(loaders_b["train"], loaders_b["valid"])

    tr_c, loaders_c, _ = _setup(tmp_path, "mm", autosave_every_calls=1,
                                resident_data="on", epochs=1)
    with pytest.raises(ValueError, match="STREAMING"):
        tr_c.fit(loaders_c["train"], loaders_c["valid"], resume=True)
