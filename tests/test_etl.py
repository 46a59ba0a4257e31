"""ETL pipeline on a synthetic raw Taobao-style CSV."""

import numpy as np
import pandas as pd
import pytest

from clsr_tpu.data import etl
from clsr_tpu.data.vocab import load_vocab


@pytest.fixture()
def raw_taobao(tmp_path):
    """Synthetic UserBehavior.csv inside the reference's date window."""
    rng = np.random.RandomState(0)
    start = 1511539200  # 2017-11-25 00:00 UTC-ish; within clamp window
    rows = []
    # enough users that 5% downsample + 10-core filters keep a usable graph
    for uid in range(1, 801):
        n = rng.randint(18, 30)
        ts = np.sort(start + rng.randint(0, 8 * 24 * 3600, n))
        for t in ts:
            iid = rng.randint(1, 30)
            rows.append((uid, iid, iid % 7 + 1, "pv", int(t)))
    # noise: non-pv events must be dropped
    rows.append((1, 1, 1, "buy", start + 5))
    path = tmp_path / "UserBehavior.csv"
    pd.DataFrame(rows).to_csv(path, header=False, index=False)
    return str(path)


def test_filter_k_core():
    df = pd.DataFrame({"uid": [1, 1, 1, 2], "iid": [10, 11, 12, 10]})
    out = etl.filter_k_core(df, 2, "uid", "iid")
    assert set(out["uid"]) == {1}


def test_filter_multiple_cids():
    df = pd.DataFrame({"iid": [1, 1, 2], "category": [5, 6, 7]})
    out = etl.filter_items_with_multiple_cids(df)
    assert set(out["iid"]) == {2}


def test_split_global_time():
    df = pd.DataFrame({"timestamp": [0, 50, 100, 150, 190, 199, 200]})
    s = etl.split_global_time(df, 50)
    # t_max=200: test >= 150, valid in [100,150)
    assert list(s) == ["train", "train", "valid", "test", "test", "test",
                      "test"]


def test_full_pipeline(raw_taobao, tmp_path):
    files = {k: str(tmp_path / k) for k in
             ("train", "valid", "test", "uv.pkl", "iv.pkl", "cv.pkl")}
    etl.data_preprocessing(
        raw_taobao, files["train"], files["valid"], files["test"],
        files["uv.pkl"], files["iv.pkl"], files["cv.pkl"],
        dataset="taobao", valid_num_ngs=3, test_num_ngs=5, seed=0)

    # vocab: id 0 reserved, loadable by the runtime Vocab
    iv = load_vocab(files["iv.pkl"])
    assert iv.lookup("not_an_item") == 0
    assert len(iv) > 1

    # train lines: 8 cols, label 1, expanding history
    with open(files["train"]) as f:
        train_lines = [l.split("\t") for l in f.read().splitlines()]
    assert len(train_lines) > 0
    for cols in train_lines[:50]:
        assert len(cols) == 8
        assert cols[0] == "1"
        assert len(cols[5].split(",")) == len(cols[6].split(","))
        assert len(cols[5].split(",")) == len(cols[7].split(","))

    # valid/test: groups of 1 positive + n negatives sharing history
    for name, n_ngs in (("valid", 3), ("test", 5)):
        with open(files[name]) as f:
            lines = [l.split("\t") for l in f.read().splitlines()]
        if not lines:
            continue
        assert len(lines) % (1 + n_ngs) == 0
        for g in range(0, min(len(lines), 4 * (1 + n_ngs)), 1 + n_ngs):
            assert lines[g][0] == "1"
            negs = set()
            for j in range(1, 1 + n_ngs):
                assert lines[g + j][0] == "0"
                assert lines[g + j][2] != lines[g][2]   # neg != pos
                assert lines[g + j][2] not in negs       # unique per group
                negs.add(lines[g + j][2])
                assert lines[g + j][5] == lines[g][5]    # shared history
                assert lines[g + j][1] == lines[g][1]    # same user


def test_expanding_history_is_prefix(raw_taobao, tmp_path):
    files = {k: str(tmp_path / k) for k in
             ("train", "valid", "test", "uv.pkl", "iv.pkl", "cv.pkl")}
    etl.data_preprocessing(
        raw_taobao, files["train"], files["valid"], files["test"],
        files["uv.pkl"], files["iv.pkl"], files["cv.pkl"],
        dataset="taobao", valid_num_ngs=2, test_num_ngs=2, seed=1)
    # within a user, later train lines extend earlier histories
    per_user = {}
    with open(files["train"]) as f:
        for line in f.read().splitlines():
            cols = line.split("\t")
            per_user.setdefault(cols[1], []).append(cols[5])
    checked = 0
    for hists in per_user.values():
        for a, b in zip(hists[:-1], hists[1:]):
            assert b.startswith(a)
            checked += 1
    assert checked > 0


def test_native_expand_matches_python_train_split():
    """engine='native' (C++ line generation): train split byte-identical
    (no rng at frac 1.0); valid/test counts in the sampling range."""
    import numpy as np
    import pandas as pd
    import pytest

    from clsr_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(0)
    n = 20_000
    users = np.sort(rng.randint(0, 600, n))
    df = pd.DataFrame({
        "user_id": users,
        "item_id": rng.randint(1, 5000, n),
        "cate_id": rng.randint(1, 100, n),
        "timestamp": np.sort(1_500_000_000 + rng.randint(0, 9 * 24 * 3600, n)),
    }).sort_values(["user_id", "timestamp"], kind="stable")
    splits = etl.split_global_time(df, 24 * 3600)
    sub = {"train": 1.0, "valid": 0.2, "test": 0.2}

    import tempfile, os
    d = tempfile.mkdtemp()
    p = lambda t, s: os.path.join(d, f"{t}_{s}")
    etl.generate_expanding(df, splits, p("py", "tr"), p("py", "va"),
                           p("py", "te"), sub,
                           rng=np.random.RandomState(3))
    etl.generate_expanding(df, splits, p("na", "tr"), p("na", "va"),
                           p("na", "te"), sub,
                           rng=np.random.RandomState(3), engine="native")
    assert open(p("py", "tr")).read() == open(p("na", "tr")).read()
    for s in ("va", "te"):
        npy = sum(1 for _ in open(p("py", s)))
        nna = sum(1 for _ in open(p("na", s)))
        assert 0.7 < nna / max(npy, 1) < 1.4, (s, npy, nna)


def test_native_expand_falls_back_on_string_ids(tmp_path):
    """String user/item ids are not numeric-convertible -> python path."""
    import numpy as np
    import pandas as pd

    df = pd.DataFrame({
        "user_id": ["uA", "uA", "uA", "uB", "uB", "uB"],
        "item_id": ["i1", "i2", "i3", "i2", "i4", "i5"],
        "cate_id": ["c1", "c1", "c2", "c1", "c2", "c2"],
        "timestamp": [10, 20, 30, 15, 25, 35],
    })
    splits = pd.Series(["train"] * 6)
    out = {s: str(tmp_path / s) for s in ("tr", "va", "te")}
    etl.generate_expanding(df, splits, out["tr"], out["va"], out["te"],
                           {"train": 1.0}, rng=np.random.RandomState(0),
                           engine="native")
    lines = open(out["tr"]).read().splitlines()
    assert len(lines) == 4                      # 2 users x (3-1) events
    assert lines[0].split("\t")[1] == "uA"      # string ids intact
