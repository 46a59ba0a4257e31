"""Histogram summaries (reference parity: the tf.summary.histogram
stream, clsr.py:111,155,171,217,222,237,266,276 and
sequential_base_model.py:387-438).

The TPU-native form computes bucket COUNTS on device
(training/steps.py:make_histogram_step) and ships nbins+2 scalars per
tag, instead of shipping raw activation tensors through the relay.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.steps import _device_histogram, make_histogram_step
from clsr_tpu.training.trainer import Trainer
from clsr_tpu.utils.summaries import SummaryWriter


def test_device_histogram_matches_numpy():
    r = np.random.RandomState(0)
    x = r.randn(512).astype(np.float32) * 3.1 + 0.7
    counts, lo, hi, bad = jax.jit(lambda v: _device_histogram(v, 32))(
        jnp.asarray(x))
    assert int(bad) == 0
    counts = np.asarray(counts)
    assert counts.sum() == x.size
    assert float(lo) == pytest.approx(x.min(), rel=1e-6)
    assert float(hi) == pytest.approx(x.max(), rel=1e-6)
    ref, _ = np.histogram(x, bins=32, range=(x.min(), x.max()))
    # edge-assignment of exact boundary values may differ by one slot
    assert np.abs(counts - ref).sum() <= 4


def test_constant_tensor_histogram():
    counts, lo, hi, _ = _device_histogram(jnp.full((64,), 2.5), 16)
    assert np.asarray(counts).sum() == 64
    assert float(lo) == float(hi) == 2.5


def test_nonfinite_histogram():
    """NaN/Inf (the divergence regime) must not poison the buckets: they
    are excluded from [lo, hi], counted separately, and the JSONL record
    stays strict JSON (ADVICE r4)."""
    x = jnp.asarray([1.0, 2.0, jnp.nan, jnp.inf, -jnp.inf, 3.0])
    counts, lo, hi, bad = jax.jit(lambda v: _device_histogram(v, 8))(x)
    assert int(bad) == 3
    assert np.asarray(counts).sum() == 3
    assert float(lo) == 1.0 and float(hi) == 3.0
    # all-non-finite: empty buckets, pinned [0, 0] range
    counts, lo, hi, bad = _device_histogram(jnp.full((4,), jnp.nan), 8)
    assert int(bad) == 4 and np.asarray(counts).sum() == 0
    assert float(lo) == float(hi) == 0.0
    # writer emits strict JSON with the nonfinite count
    import io, json as _json
    w = SummaryWriter.__new__(SummaryWriter)
    w.log_dir, w._tb = None, None
    w._jsonl = io.StringIO()
    w.histograms(1, {"t": (np.array([1, 2]), 0.0, 1.0, 3)})
    rec = _json.loads(w._jsonl.getvalue())
    assert rec["nonfinite"] == 3 and rec["counts"] == [1, 2]


def _setup(tmp_path, **cfg_kw):
    ds = str(tmp_path / "ds")
    if not os.path.exists(os.path.join(ds, "train_data")):
        write_synthetic_dataset(ds, n_users=40, n_items=80, n_cates=8,
                                valid_num_ngs=4, test_num_ngs=4, seed=3)
    paths = {n: os.path.join(ds, f"{n}_data")
             for n in ("train", "valid")}
    paths.update({f"{n}_vocab": os.path.join(ds, f"{n}_vocab.pkl")
                  for n in ("user", "item", "cate")})
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    base = dict(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=10, batch_size=16, train_num_ngs=2, valid_num_ngs=4,
        hidden_size=12, item_embedding_dim=8, cate_embedding_dim=4,
        user_embedding_dim=12, att_fcn_layer_sizes=(8,), layer_sizes=(8,),
        activation=("relu",), epochs=1, early_stop=0, show_step=1,
        save_model=False, seed=5, optimizer="lazyadam",
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
    return model, cfg, sample, loaders


def test_histogram_step_tags_and_mass(tmp_path):
    model, cfg, sample, _ = _setup(tmp_path)
    from clsr_tpu.training.state import create_train_state
    state = create_train_state(model, cfg, sample)
    hists = jax.device_get(make_histogram_step(model, cfg)(state, sample))
    # reference tags with a 1:1 counterpart must be present
    for tag in ("model_output", "logit", "alpha", "att_fea_long", "att_fea2",
                "item_embedding_output", "user_long_embedding_output",
                "user_short_embedding_output", "cate_embedding_output"):
        assert tag in hists, sorted(hists)
    for tag, (counts, lo, hi, _bad) in hists.items():
        assert counts.sum() > 0, tag
        assert np.isfinite([lo, hi]).all(), tag
        assert lo <= hi, tag
    # alpha counts must cover exactly B*G sigmoid outputs in [0, 1]
    counts, lo, hi, _bad = hists["alpha"]
    B, G = sample.users.shape[0], sample.items.shape[1]
    assert counts.sum() == B * G
    assert 0.0 <= lo <= hi <= 1.0


def test_fit_writes_histogram_records(tmp_path):
    sdir = str(tmp_path / "summ")
    model, cfg, sample, loaders = _setup(
        tmp_path, summaries_dir=sdir, write_histograms=True)
    tr = Trainer(model, cfg, sample, log=lambda *a: None)
    tr.fit(loaders["train"], loaders["valid"])
    recs = [json.loads(l) for l in
            open(os.path.join(sdir, "scalars.jsonl"))]
    hist_recs = [r for r in recs if "hist" in r]
    assert hist_recs, "no histogram records written"
    tags = {r["hist"] for r in hist_recs}
    assert "alpha" in tags and "model_output" in tags
    for r in hist_recs[:8]:
        assert sum(r["counts"]) > 0
        assert r["lo"] <= r["hi"]


@pytest.mark.slow
def test_fit_writes_histograms_on_mesh(tmp_path):
    """The probe step is a plain jit over GSPMD-sharded state (tables
    row-sharded over 'model') — must compile and write records."""
    sdir = str(tmp_path / "summ_mesh")
    model, cfg, sample, loaders = _setup(
        tmp_path, summaries_dir=sdir, write_histograms=True,
        data_parallel=4, model_parallel=2)
    tr = Trainer(model, cfg, sample, log=lambda *a: None)
    tr.fit(loaders["train"], loaders["valid"])
    recs = [json.loads(l) for l in
            open(os.path.join(sdir, "scalars.jsonl"))]
    tags = {r["hist"] for r in recs if "hist" in r}
    assert "alpha" in tags and "item_embedding_output" in tags


def test_tb_histogram_protos(tmp_path):
    tf = pytest.importorskip("tensorflow")
    sdir = str(tmp_path / "tb")
    w = SummaryWriter(sdir, write_tfevents=True)
    if w._tb is None:
        pytest.skip("tensorboard writer unavailable")
    w.histograms(3, {"alpha": (np.array([1, 2, 3, 10]), 0.0, 1.0)})
    w.close()
    events = [f for f in os.listdir(sdir) if "tfevents" in f]
    assert events
    total = []
    for ev in events:
        for rec in tf.compat.v1.train.summary_iterator(
                os.path.join(sdir, ev)):
            for v in rec.summary.value:
                if v.tag == "alpha":
                    t = tf.make_ndarray(v.tensor)
                    total.append(t)
    assert total and total[0].shape == (4, 3)
    assert total[0][:, 2].sum() == 16
