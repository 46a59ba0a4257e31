"""Packed binary dataset format (clsr_tpu/data/packed.py).

Differential tests against the TSV round-trip: same instances + same
seed must give the same kept lines, bit-identical vocabs, and exactly
equal loader views; with negatives forced equal, grouped evaluation
through the strided eval view must reproduce the parsed-TSV metrics
bit-for-bit.
"""

import os

import numpy as np
import pandas as pd
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.etl import (create_vocab, data_preprocessing,
                               generate_expanding,
                               negative_sampling_offline)
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.packed import (PACKED_FILENAME, build_packed,
                                  load_packed, make_loader)
from clsr_tpu.data.parser import parse_file, time_range_for_unit
from clsr_tpu.data.vocab import load_vocab


SUBSAMPLE = {"train": 1.0, "valid": 0.5, "test": 0.5}


def _instances(n_users=30, n_items=60, n_cates=8, seed=11,
               min_events=12, max_events=30):
    """Synthetic instance stream shaped like create_instances output:
    sorted by (uid, ts), numeric ids, second timestamps."""
    rng = np.random.RandomState(seed)
    rows = []
    t0 = 1_500_000_000
    for u in range(1, n_users + 1):
        n_ev = rng.randint(min_events, max_events)
        t = t0 + np.cumsum(rng.randint(10, 50_000, size=n_ev))
        items = rng.randint(1, n_items + 1, size=n_ev)
        for e in range(n_ev):
            rows.append((1, u, items[e], (items[e] % n_cates) + 1, t[e]))
    df = pd.DataFrame(rows, columns=["label", "user_id", "item_id",
                                     "cate_id", "timestamp"])
    return df


def _splits(instances):
    t = instances["timestamp"]
    hi = t.quantile(0.9)
    mid = t.quantile(0.8)
    return pd.Series(np.where(t >= hi, "test",
                              np.where(t >= mid, "valid", "train")),
                     index=instances.index)


@pytest.fixture(scope="module")
def both_paths(tmp_path_factory):
    """TSV pipeline and packed pipeline from the SAME instances + seed."""
    out = tmp_path_factory.mktemp("packfmt")
    inst = _instances()
    splits = _splits(inst)

    paths = {s: str(out / f"{s}_data") for s in ("train", "valid", "test")}
    generate_expanding(inst, splits, paths["train"], paths["valid"],
                       paths["test"], SUBSAMPLE,
                       rng=np.random.RandomState(5))
    vpaths = {v: str(out / f"{v}_vocab.pkl") for v in ("user", "item", "cate")}
    create_vocab(paths["train"], vpaths["user"], vpaths["item"],
                 vpaths["cate"])
    negative_sampling_offline(inst, paths["valid"], paths["test"],
                              valid_num_ngs=3, test_num_ngs=5,
                              rng=np.random.RandomState(6))

    pack, vocabs = build_packed(inst, splits, SUBSAMPLE,
                                rng=np.random.RandomState(5),
                                valid_num_ngs=3, test_num_ngs=5)
    return inst, paths, vpaths, pack, vocabs


def test_vocabs_bit_identical(both_paths):
    _, _, vpaths, _, vocabs = both_paths
    for vocab, name in zip(vocabs, ("user", "item", "cate")):
        tsv_vocab = load_vocab(vpaths[name])
        assert list(vocab.mapping.items()) == \
            list(tsv_vocab.mapping.items()), name


def test_train_view_exact(both_paths):
    _, paths, vpaths, pack, _ = both_paths
    uv, iv, cv = (load_vocab(vpaths[v]) for v in ("user", "item", "cate"))
    L = 12
    tr = time_range_for_unit("s")
    ds = parse_file(paths["train"], uv, iv, cv, time_unit="s")
    ref = SequenceLoader(ds, L).view
    got = make_loader(pack, "train", L, tr).view
    for f in ("users", "items", "cates", "labels", "lengths", "item_hist",
              "cate_hist", "mask"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f), f)
    for f in ("time_diff", "time_from_first", "time_to_now"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f), f)


def test_eval_view_matches_tsv_rows(both_paths):
    """Strided eval view == parsed TSV view on every shared field;
    negatives check the reference's sampling invariants."""
    inst, paths, vpaths, pack, _ = both_paths
    uv, iv, cv = (load_vocab(vpaths[v]) for v in ("user", "item", "cate"))
    L, G = 12, 4  # 1 + valid_num_ngs
    tr = time_range_for_unit("s")
    ds = parse_file(paths["valid"], uv, iv, cv, time_unit="s")
    ref = SequenceLoader(ds, L).view
    got = make_loader(pack, "valid", L, tr).view

    n = got.n_rows
    assert n == len(ref.labels)
    rows = np.arange(n)
    # per-row fields shared regardless of negative draws
    np.testing.assert_array_equal(got.users[rows], ref.users)
    np.testing.assert_array_equal(got.lengths[rows], ref.lengths)
    np.testing.assert_array_equal(got.labels[rows], ref.labels)
    np.testing.assert_array_equal(got.item_hist[rows], ref.item_hist)
    np.testing.assert_array_equal(got.time_to_now[rows], ref.time_to_now)
    # positives (anchor rows) share targets too
    anchors = rows[::G]
    np.testing.assert_array_equal(got.items[anchors], ref.items[anchors])
    np.testing.assert_array_equal(got.cates[anchors], ref.cates[anchors])

    # negative invariants (sequential_reviews.py:147-199): unique per
    # line, != positive, drawn from the instance pool, category = the
    # item's (keep-last) instance category
    s = pack.splits["valid"]
    pos = pack.ev_item[pack.group_offsets[s.line_group.astype(np.int64)]
                       + s.line_k]
    for r in range(len(s)):
        negs = s.neg_item[r]
        assert len(set(negs.tolist())) == len(negs)
        assert not np.any(negs == pos[r])


def test_eval_metrics_exact_with_forced_negatives(both_paths):
    """With the packed negatives overwritten by the TSV file's draws,
    run_weighted_eval through the strided view must equal the parsed-TSV
    evaluation bit-for-bit."""
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step

    _, paths, vpaths, pack, _ = both_paths
    uv, iv, cv = (load_vocab(vpaths[v]) for v in ("user", "item", "cate"))
    L, G = 12, 4
    tr = time_range_for_unit("s")
    ds = parse_file(paths["valid"], uv, iv, cv, time_unit="s")
    ref_loader = SequenceLoader(ds, L)

    import copy
    pk = copy.deepcopy(pack)
    s = pk.splits["valid"]
    items_by_line = ds.items.reshape(-1, G)
    cates_by_line = ds.cates.reshape(-1, G)
    s.neg_item = items_by_line[:, 1:].astype(np.int32)
    s.neg_cate = cates_by_line[:, 1:].astype(np.int32)
    got_loader = make_loader(pk, "valid", L, tr)

    cfg = Config(model_type="gru4rec", user_vocab="u", item_vocab="i",
                 cate_vocab="c", item_embedding_dim=8, cate_embedding_dim=4,
                 hidden_size=12, max_seq_length=L, batch_size=16,
                 train_num_ngs=2, valid_num_ngs=3, enable_bn=False,
                 seed=3, layer_sizes=(8,), activation=("relu",)).validate()
    model = get_model_class("gru4rec")(
        cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
    sample = next(ref_loader.train_batches(
        cfg.batch_size, np.random.RandomState(0))
        if False else ref_loader.eval_batches(G, 4))
    state = create_train_state(model, cfg, sample)
    step = make_eval_step(model, cfg)

    a = run_weighted_eval(step, state, ref_loader, cfg, num_ngs=G - 1)
    b = run_weighted_eval(step, state, got_loader, cfg, num_ngs=G - 1)
    assert a == b


def test_predict_rows_match(both_paths):
    """group_size=1 per-row iteration (the predict path) sees every TSV
    row in order through the strided adapters."""
    _, paths, vpaths, pack, _ = both_paths
    uv, iv, cv = (load_vocab(vpaths[v]) for v in ("user", "item", "cate"))
    L = 12
    tr = time_range_for_unit("s")
    got = make_loader(pack, "test", L, tr)
    ref = SequenceLoader(parse_file(paths["test"], uv, iv, cv,
                                    time_unit="s"), L)
    gb = list(got.eval_batches(group_size=1, batch_groups=8))
    rb = list(ref.eval_batches(group_size=1, batch_groups=8))
    assert len(gb) == len(rb)
    for g, r in zip(gb, rb):
        np.testing.assert_array_equal(g.users, r.users)
        np.testing.assert_array_equal(g.labels, r.labels)
        np.testing.assert_array_equal(g.item_hist, r.item_hist)


def test_recent_k_matches_parser(both_paths):
    _, paths, vpaths, pack, _ = both_paths
    uv, iv, cv = (load_vocab(vpaths[v]) for v in ("user", "item", "cate"))
    L, rk = 12, 5
    tr = time_range_for_unit("s")
    ds = parse_file(paths["train"], uv, iv, cv, time_unit="s", recent_k=rk)
    ref = SequenceLoader(ds, L).view
    got = make_loader(pack, "train", L, tr, recent_k=rk).view
    for f in ("lengths", "item_hist", "mask", "time_diff",
              "time_from_first", "time_to_now"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f), f)


def test_save_load_roundtrip(both_paths, tmp_path):
    _, _, _, pack, _ = both_paths
    p = str(tmp_path / PACKED_FILENAME)
    pack.save(p)
    back = load_packed(p)
    np.testing.assert_array_equal(back.ev_item, pack.ev_item)
    np.testing.assert_array_equal(back.group_offsets, pack.group_offsets)
    for name, s in pack.splits.items():
        np.testing.assert_array_equal(back.splits[name].line_group,
                                      s.line_group)
        if s.neg_item is not None:
            np.testing.assert_array_equal(back.splits[name].neg_item,
                                          s.neg_item)


def test_cli_end_to_end_packed(tmp_path):
    """CLI driver on the packed path: raw CSV -> packed ETL -> train ->
    grouped test eval, no TSV ever written."""
    from clsr_tpu.cli import main

    # dense stream (few items, many events/user) so the 10-core
    # item+user filters survive ANY 5%-user downsample draw
    inst = _instances(n_users=400, n_items=15, seed=2,
                      min_events=40, max_events=60)
    t_lo = 1511568000  # reference clamp start (2017-11-25 UTC)
    ts = t_lo + (inst["timestamp"].to_numpy() % (8 * 86400))
    raw = pd.DataFrame({
        "uid": inst["user_id"], "iid": inst["item_id"],
        "category": inst["cate_id"], "behavior": "pv", "ts": ts})
    raw_file = str(tmp_path / "raw.csv")
    raw.to_csv(raw_file, header=False, index=False)

    rc = main(["--dataset", "taobao", "--model", "GRU4Rec",
               "--epochs", "1", "--batch_size", "32",
               "--data_path", str(tmp_path), "--raw_data", raw_file,
               "--etl_format", "packed", "--val_num_ngs", "2",
               "--test_num_ngs", "3", "--seed", "4", "--show_step", "0"])
    assert rc == 0
    d = str(tmp_path / "taobao")
    assert os.path.exists(os.path.join(d, PACKED_FILENAME))
    assert not os.path.exists(os.path.join(d, "train_data"))


def test_data_preprocessing_packed(tmp_path):
    """End-to-end ETL entry with output_format='packed': raw taobao-style
    CSV -> packed.npz + vocab pickles, loadable and trainable."""
    # big enough to survive taobao_main's 5% user downsample and the
    # 10-core item/user filters
    inst = _instances(n_users=400, n_items=40, seed=2)
    # raw UserBehavior.csv shape: uid,iid,category,behavior,ts with
    # timestamps inside the reference's clamp window
    t_lo = 1511539200  # 2017-11-25
    ts = t_lo + (inst["timestamp"].to_numpy() % (8 * 86400))
    raw = pd.DataFrame({
        "uid": inst["user_id"], "iid": inst["item_id"],
        "category": inst["cate_id"], "behavior": "pv", "ts": ts})
    raw_file = str(tmp_path / "raw.csv")
    raw.to_csv(raw_file, header=False, index=False)

    d = str(tmp_path / "out")
    os.makedirs(d)
    data_preprocessing(
        raw_file, os.path.join(d, "train_data"),
        os.path.join(d, "valid_data"), os.path.join(d, "test_data"),
        os.path.join(d, "user_vocab.pkl"), os.path.join(d, "item_vocab.pkl"),
        os.path.join(d, "category_vocab.pkl"),
        valid_num_ngs=2, test_num_ngs=3, dataset="taobao", seed=1,
        output_format="packed")
    assert os.path.exists(os.path.join(d, PACKED_FILENAME))
    assert not os.path.exists(os.path.join(d, "train_data"))
    pack = load_packed(os.path.join(d, PACKED_FILENAME))
    uv = load_vocab(os.path.join(d, "user_vocab.pkl"))
    assert "train" in pack.splits and len(pack.splits["train"])
    assert pack.splits["test"].num_ngs == 3
    loader = make_loader(pack, "train", 10, time_range_for_unit("s"))
    batch = next(loader.train_batches(8, np.random.RandomState(0)))
    assert batch.users.shape == (8,)
    assert int(pack.ev_user.max()) < len(uv)
