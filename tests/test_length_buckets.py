"""Length-aware batching (cfg.length_buckets; VERDICT r4 item 1).

The padded training protocol runs every scan/attention over all
max_seq_length positions although the measured mask density is ~22%
(docs/mask_density.jsonl; expanding histories,
sequential_reviews.py:358-438).  Length buckets partition rows by
history length and pad each bucket to its own Lb — same math per row
(masked positions are carry-through/no-ops), fewer executed iterations.

Correctness surface tested here:
  * edge selection (choose_bucket_edges) minimizes executed iterations
    under the STRICT-boundary constraint;
  * bucket partition covers every row exactly once, strictly;
  * the reference's padded time_to_now[:, -1] fusion input
    (clsr.py:239-248) stays exactly 0 in truncated buckets;
  * per-row forward at bucket padding == forward at full L (the
    numerics the truncation must not change);
  * e2e bucketed fit (single device and mesh) trains and evaluates.
"""

import os

import jax
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.resident import (bucket_rows, build_resident,
                                    build_resident_buckets,
                                    choose_bucket_edges, gather_batch,
                                    pad_view_rows,
                                    resolve_bucket_paddings)
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.trainer import Trainer


def test_choose_edges_short_skewed():
    # 80% of rows length <= 10, 20% up to 50: expect a small first bucket
    r = np.random.RandomState(0)
    lengths = np.concatenate([r.randint(1, 11, 8000),
                              r.randint(11, 51, 2000)])
    pads = choose_bucket_edges(lengths, 50, min_rows=100)
    assert pads[-1] == 50          # rows reach 50 -> top stays L
    assert len(pads) >= 2 and pads[0] <= 24
    # executed iterations must beat the unbucketed N*L by >= the
    # advertised min_gain
    tl = np.minimum(lengths, 50)
    execd = 0
    prev = 0
    for i, e in enumerate(pads):
        hi = 50 if i == len(pads) - 1 else e - 1
        execd += ((tl >= prev) & (tl <= hi)).sum() * e
        prev = hi + 1
    assert len(lengths) * 50 / execd > 1.5


def test_choose_edges_top_shrinks_below_L():
    # no row fills L: top pad must shrink to round8(max+1), keeping the
    # last column padding (the time_to_now[:, -1] quirk)
    lengths = np.full(5000, 29)
    pads = choose_bucket_edges(lengths, 50, min_rows=100)
    assert pads[-1] == 32
    # uniform-at-29 rows: no inner edge is worth a second program
    assert pads == [32]


def test_choose_edges_full_length_returns_L():
    lengths = np.full(3000, 50)
    assert choose_bucket_edges(lengths, 50, min_rows=100) == [50]


def test_bucket_rows_strict_partition():
    r = np.random.RandomState(1)
    lengths = r.randint(1, 61, 4000)     # raw lengths may exceed L=50
    buckets = bucket_rows(lengths, 50, [16, 50])
    seen = np.concatenate([rows for _, rows in buckets])
    assert sorted(seen) == list(range(4000))      # exact cover
    tl = np.minimum(lengths, 50)
    for Lb, rows in buckets:
        if Lb < 50:
            assert tl[rows].max() <= Lb - 1       # strict boundary
        assert tl[rows].max() <= Lb


def _setup(tmp_path, L=20, **cfg_kw):
    ds = str(tmp_path / "ds")
    if not os.path.exists(os.path.join(ds, "train_data")):
        write_synthetic_dataset(ds, n_users=60, n_items=90, n_cates=8,
                                valid_num_ngs=4, test_num_ngs=4, seed=3)
    paths = {n: os.path.join(ds, f"{n}_data") for n in ("train", "valid")}
    paths.update({f"{n}_vocab": os.path.join(ds, f"{n}_vocab.pkl")
                  for n in ("user", "item", "cate")})
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    base = dict(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=16, train_num_ngs=2, valid_num_ngs=4,
        hidden_size=12, item_embedding_dim=8, cate_embedding_dim=4,
        user_embedding_dim=12, att_fcn_layer_sizes=(8,), layer_sizes=(8,),
        activation=("relu",), epochs=2, early_stop=0, show_step=0,
        save_model=False, seed=5, optimizer="lazyadam",
        contrastive_length_threshold=1, resident_data="on",
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


def test_bucket_gather_quirk_and_content(tmp_path):
    model, cfg, sample, loaders = _setup(tmp_path)
    import dataclasses
    view = loaders["train"].view
    L = view.item_hist.shape[1]
    pads = resolve_bucket_paddings(
        dataclasses.replace(cfg, length_buckets="8"), view.lengths)
    buckets = build_resident_buckets(view, pads)
    full = build_resident(view)
    for (res, rows) in buckets:
        Lb = res.seq_len
        n = min(8, res.n_rows)
        idx = np.arange(n, dtype=np.int32)
        valid = np.ones(n, bool)
        b = jax.device_get(gather_batch(res, idx, valid))
        fb = jax.device_get(
            gather_batch(full, rows[:n].astype(np.int32), valid))
        # same rows, bucket-truncated columns
        np.testing.assert_array_equal(b.item_hist, fb.item_hist[:, :Lb])
        np.testing.assert_array_equal(b.mask, fb.mask[:, :Lb])
        np.testing.assert_array_equal(b.time_to_now,
                                      fb.time_to_now[:, :Lb])
        # nothing real lives past Lb
        assert fb.mask[:, Lb:].sum() == 0
        if Lb < L:
            # strict boundary -> the fusion input column is padding
            assert (b.time_to_now[:, -1] == 0).all()
            assert (fb.time_to_now[:, -1] == 0).all()


def test_bucketed_forward_equals_full_L(tmp_path):
    """Per-row eval forward at bucket padding must match full-L padding:
    masked scan steps are carry-through, masked attention positions are
    exact zeros, BN (eval mode) is elementwise."""
    model, cfg, sample, loaders = _setup(tmp_path)
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step_fn
    import dataclasses
    state = create_train_state(model, cfg, sample)
    view = loaders["train"].view
    pads = resolve_bucket_paddings(
        dataclasses.replace(cfg, length_buckets="8"), view.lengths)
    buckets = build_resident_buckets(view, pads)
    full = build_resident(view)
    step = make_eval_step_fn(model, cfg)
    for (res, rows) in buckets:
        n = min(16, res.n_rows)
        idx = np.arange(n, dtype=np.int32)
        valid = np.ones(n, bool)
        pb = gather_batch(res, idx, valid)
        fb = gather_batch(full, rows[:n].astype(np.int32), valid)
        preds_b, alpha_b = jax.device_get(step(state, pb))
        preds_f, alpha_f = jax.device_get(step(state, fb))
        np.testing.assert_allclose(preds_b, preds_f, rtol=0, atol=1e-6)
        np.testing.assert_allclose(alpha_b, alpha_f, rtol=0, atol=1e-6)


def test_bucketed_eval_metrics_match_flat(tmp_path):
    """Length-bucketed eval (evaluator.run_weighted_eval under
    cfg.length_buckets) must reproduce the flat eval EXACTLY: groups are
    only reordered across buckets (the metric assembly is
    order-invariant) and the per-group forward is padding-invariant
    (test_bucketed_forward_equals_full_L)."""
    import dataclasses

    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step_fn

    model, cfg, sample, loaders = _setup(tmp_path)
    state = create_train_state(model, cfg, sample)
    step = make_eval_step_fn(model, cfg)

    flat = run_weighted_eval(step, state, loaders["valid"], cfg,
                             num_ngs=cfg.valid_num_ngs,
                             calc_mean_alpha=True)
    bucketed = run_weighted_eval(
        step, state, loaders["valid"],
        dataclasses.replace(cfg, length_buckets="8"),
        num_ngs=cfg.valid_num_ngs, calc_mean_alpha=True)
    assert bucketed == flat

    # the bucketed pass really ran truncated batches (at least one
    # bucket below L must exist on this short-skewed synthetic data)
    v = loaders["valid"].view
    anchors = np.arange(0, len(v.labels), cfg.valid_num_ngs + 1)
    pads = resolve_bucket_paddings(
        dataclasses.replace(cfg, length_buckets="8"), v.lengths[anchors])
    assert pads and pads[0] < cfg.max_seq_length


def test_bucketed_fit_e2e(tmp_path):
    model, cfg, sample, loaders = _setup(
        tmp_path, length_buckets="8", resident_round_rows=64)
    logs = []
    tr = Trainer(model, cfg, sample, log=logs.append)
    tr.fit(loaders["train"], loaders["valid"])
    assert tr._buckets is not None and len(tr._buckets) >= 1
    assert any("length buckets" in str(l) for l in logs)
    res = tr.eval_history[-1][1]
    assert np.isfinite(res["wauc"]) and res["wauc"] > 0.4
    # round_rows honored: every bucket row count is a multiple of 64
    for res_b, _rows in tr._buckets:
        assert res_b.n_rows % 64 == 0


def test_auto_noops_on_tiny_data(tmp_path):
    """'auto' must refuse buckets that fail the min-rows guard (no
    near-empty compiled programs) and fall back to the plain resident
    path."""
    model, cfg, sample, loaders = _setup(tmp_path, length_buckets="auto")
    tr = Trainer(model, cfg, sample, log=lambda *a: None)
    rng, n_steps, _loss = tr._resident_epoch(
        loaders["train"], jax.random.PRNGKey(0),
        np.random.RandomState(0), 0)
    assert tr._buckets is None and tr._resident is not None
    assert n_steps > 0


@pytest.mark.slow
def test_bucketed_step_count_matches_unbucketed(tmp_path):
    """Bucketing must train on (almost) the same rows: total steps per
    epoch may differ only by per-bucket trailing-batch drops."""
    model, cfg, sample, loaders = _setup(tmp_path)
    tr = Trainer(model, cfg, sample, log=lambda *a: None)
    rng = jax.random.PRNGKey(0)
    rng2, n_steps_plain, _ = tr._resident_epoch(
        loaders["train"], rng, np.random.RandomState(0), 0)

    model2, cfg2, sample2, _ = _setup(tmp_path, length_buckets="8")
    tr2 = Trainer(model2, cfg2, sample2, log=lambda *a: None)
    rng3, n_steps_bucketed, _ = tr2._resident_epoch(
        loaders["train"], rng, np.random.RandomState(0), 0)
    n_buckets = len(tr2._buckets)
    assert abs(n_steps_bucketed - n_steps_plain) <= n_buckets + 1


@pytest.mark.slow
def test_bucketed_fit_mesh(tmp_path):
    model, cfg, sample, loaders = _setup(
        tmp_path, length_buckets="8", data_parallel=4, model_parallel=2)
    tr = Trainer(model, cfg, sample, log=lambda *a: None)
    tr.fit(loaders["train"], loaders["valid"])
    assert tr._buckets is not None and len(tr._buckets) >= 2
    res = tr.eval_history[-1][1]
    assert np.isfinite(res["wauc"])


def test_config_validation(tmp_path):
    import dataclasses
    _model, cfg, _sample, _loaders = _setup(tmp_path, L=50)
    with pytest.raises(ValueError, match="length_buckets"):
        dataclasses.replace(cfg, length_buckets="50").validate()
    with pytest.raises(ValueError, match="length_buckets"):
        dataclasses.replace(cfg, length_buckets="16,8").validate()
    with pytest.raises(ValueError, match="length_buckets"):
        dataclasses.replace(cfg, length_buckets="banana").validate()
    with pytest.raises(ValueError, match="autosave"):
        dataclasses.replace(cfg, length_buckets="16",
                            autosave_every_calls=2,
                            model_dir="/tmp/x").validate()
    dataclasses.replace(cfg, length_buckets="8,16").validate()
    dataclasses.replace(cfg, length_buckets="auto").validate()


def test_pad_view_rows_zero_rows_never_eligible(tmp_path):
    model, cfg, sample, loaders = _setup(tmp_path)
    view = loaders["train"].view
    pv = pad_view_rows(view, 128)
    assert len(pv.users) % 128 == 0
    n_real = len(view.users)
    assert (pv.lengths[n_real:] == 0).all()
    np.testing.assert_array_equal(pv.item_hist[:n_real], view.item_hist)


def test_masked_bn_matches_batchnorm_when_unpadded():
    """MaskedBatchNorm with an all-ones weight must reproduce
    nn.BatchNorm exactly (same variable tree, same normalization, same
    running-average update)."""
    import flax.linen as nn
    import jax.numpy as jnp
    from clsr_tpu.ops.mlp import MaskedBatchNorm

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(4, 6, 3, 8).astype(np.float32))
    w = jnp.ones((4, 6, 1, 1))
    mbn = MaskedBatchNorm(momentum=0.95, epsilon=1e-4)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.95,
                      epsilon=1e-4)
    vm = mbn.init(jax.random.PRNGKey(0), x, w, True)
    vb = bn.init(jax.random.PRNGKey(0), x)
    ym, sm = mbn.apply(vm, x, w, True, mutable=["batch_stats"])
    yb, sb = bn.apply(vb, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ym), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sm["batch_stats"]["mean"]),
        np.asarray(sb["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sm["batch_stats"]["var"]),
        np.asarray(sb["batch_stats"]["var"]), rtol=1e-4, atol=1e-5)
    # eval mode: running-stats affine, weight ignored
    ye = mbn.apply(vm, x, w * 0.0, False)
    bn_eval = nn.BatchNorm(use_running_average=True, momentum=0.95,
                           epsilon=1e-4)
    yb_e = bn_eval.apply(vb, x)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yb_e),
                               rtol=1e-5, atol=1e-5)


def test_masked_bn_train_forward_padding_invariant(tmp_path):
    """With bn_stats_mask on, the TRAIN-mode forward (batch-stat BN)
    must be padding-proportion invariant: the same rows at bucket
    padding Lb and at full L produce the same losses.  (This is the
    property whose absence collapsed the round-5 bucketed quality cell
    by -14pt: unmasked BN statistics average padded-position
    activations, so each bucket's compiled program normalized
    differently.)"""
    import dataclasses
    model, cfg, sample, loaders = _setup(tmp_path,
                                         bn_stats_mask="on")
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_train_step_fn
    state = create_train_state(model, cfg, sample)
    view = loaders["train"].view
    pads = resolve_bucket_paddings(
        dataclasses.replace(cfg, length_buckets="8"), view.lengths)
    buckets = build_resident_buckets(view, pads)
    full = build_resident(view)
    step = make_train_step_fn(model, cfg)
    rng = jax.random.PRNGKey(7)
    for (res, rows) in buckets:
        n = min(16, res.n_rows)
        idx = np.arange(n, dtype=np.int32)
        valid = np.ones(n, bool)
        pb = gather_batch(res, idx, valid)
        fb = gather_batch(full, rows[:n].astype(np.int32), valid)
        _, parts_b = step(state, pb, rng)
        _, parts_f = step(state, fb, rng)
        np.testing.assert_allclose(float(parts_b.loss),
                                   float(parts_f.loss),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(parts_b.data_loss),
                                   float(parts_f.data_loss),
                                   rtol=1e-5, atol=1e-6)


def test_bn_stats_mask_validation(tmp_path):
    import dataclasses
    _m, cfg, _s, _l = _setup(tmp_path)
    with pytest.raises(ValueError, match="bn_stats_mask"):
        dataclasses.replace(cfg, bn_stats_mask="banana").validate()
    dataclasses.replace(cfg, bn_stats_mask="on").validate()
