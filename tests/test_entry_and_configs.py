"""Driver entry points + YAML config parity guards."""

import glob
import os

import jax
import pytest

from clsr_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "clsr_tpu", "configs")


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 5)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_all_yaml_configs_load():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
    assert len(paths) == 10
    for p in paths:
        cfg = load_config(p, user_vocab="u", item_vocab="i", cate_vocab="c")
        assert cfg.model_type == os.path.basename(p)[:-5]


def test_reference_config_values_preserved():
    """Spot-check values the reference pins (config/*.yaml)."""
    clsr = load_config(os.path.join(CONFIG_DIR, "clsr.yaml"),
                       user_vocab="u", item_vocab="i", cate_vocab="c")
    assert clsr.layer_sizes == (100, 64)
    assert clsr.att_fcn_layer_sizes == (80, 40)
    assert clsr.item_embedding_dim == 32
    assert clsr.cate_embedding_dim == 8
    assert clsr.user_embedding_dim == 40
    assert clsr.hidden_size == 40
    assert clsr.enable_bn is True
    assert clsr.loss == "softmax"
    assert clsr.learning_rate == 0.001

    sli = load_config(os.path.join(CONFIG_DIR, "sli_rec.yaml"),
                      user_vocab="u", item_vocab="i", cate_vocab="c")
    assert sli.user_embedding_dim == 16     # sli_rec.yaml quirk

    caser = load_config(os.path.join(CONFIG_DIR, "caser.yaml"),
                        user_vocab="u", item_vocab="i", cate_vocab="c")
    assert (caser.L, caser.T, caser.n_v, caser.n_h) == (3, 1, 128, 128)

    dien = load_config(os.path.join(CONFIG_DIR, "dien.yaml"),
                       user_vocab="u", item_vocab="i", cate_vocab="c")
    assert dien.activation == ("dice", "dice")

    nin = load_config(os.path.join(CONFIG_DIR, "nextitnet.yaml"),
                      user_vocab="u", item_vocab="i", cate_vocab="c")
    assert nin.dilations == (1, 2, 4, 1, 2, 4)
    assert nin.kernel_size == 3
    assert nin.user_dropout is True
