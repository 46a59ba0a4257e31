"""Native C++ parser: bit-parity with the Python parser, and speed."""

import time

import numpy as np
import pytest

from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab

native = pytest.importorskip("clsr_tpu.native")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("native")
    paths = write_synthetic_dataset(str(out), n_users=40, n_items=80,
                                    n_cates=10, test_num_ngs=9)
    return paths, (load_vocab(paths["user_vocab"]),
                   load_vocab(paths["item_vocab"]),
                   load_vocab(paths["cate_vocab"]))


def test_native_available():
    assert native.available(), "g++ build of libfastparse.so failed"


@pytest.mark.parametrize("split", ["train", "valid", "test"])
@pytest.mark.parametrize("unit", ["s", "ms"])
def test_native_matches_python(dataset, split, unit):
    paths, (uv, iv, cv) = dataset
    py = parse_file(paths[split], uv, iv, cv, time_unit=unit,
                    use_native=False)
    nat = parse_file(paths[split], uv, iv, cv, time_unit=unit,
                     use_native=True)
    assert len(py) == len(nat) > 0
    np.testing.assert_array_equal(py.labels, nat.labels)
    np.testing.assert_array_equal(py.users, nat.users)
    np.testing.assert_array_equal(py.items, nat.items)
    np.testing.assert_array_equal(py.cates, nat.cates)
    np.testing.assert_array_equal(py.offsets, nat.offsets)
    np.testing.assert_array_equal(py.hist_items, nat.hist_items)
    np.testing.assert_array_equal(py.hist_cates, nat.hist_cates)
    np.testing.assert_allclose(py.times, nat.times, rtol=0)
    np.testing.assert_allclose(py.time_diff, nat.time_diff, atol=1e-6)
    np.testing.assert_allclose(py.time_from_first, nat.time_from_first,
                               atol=1e-6)
    np.testing.assert_allclose(py.time_to_now, nat.time_to_now, atol=1e-6)


def test_native_is_faster_on_large_file(tmp_path, dataset):
    paths, (uv, iv, cv) = dataset
    # blow the train file up ~50x
    with open(paths["train"]) as f:
        content = f.read()
    big = tmp_path / "big_train"
    big.write_text(content * 50)

    t0 = time.perf_counter()
    py = parse_file(str(big), uv, iv, cv, use_native=False)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    nat = parse_file(str(big), uv, iv, cv, use_native=True)
    t_nat = time.perf_counter() - t0

    assert len(py) == len(nat)
    assert t_nat < t_py, (t_nat, t_py)
    print(f"python {t_py*1e3:.1f}ms native {t_nat*1e3:.1f}ms "
          f"speedup {t_py/t_nat:.1f}x")
