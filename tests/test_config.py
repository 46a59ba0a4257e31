"""Config loading: YAML flattening, overrides, validation.

Mirrors semantics of reference prepare_hparams / check_nn_config
(deeprec_utils.py:25-534).
"""

import pytest

from clsr_tpu.config import Config, load_config


def test_defaults_validate():
    cfg = load_config(
        user_vocab="u.pkl", item_vocab="i.pkl", cate_vocab="c.pkl"
    )
    assert cfg.model_type == "clsr"
    assert cfg.layer_sizes == (100, 64)
    assert cfg.att_fcn_layer_sizes == (80, 40)
    assert cfg.contrastive_loss == "triplet"
    assert cfg.target_dim == 40


def test_yaml_sections_flatten_and_overrides_win(tmp_path):
    y = tmp_path / "m.yaml"
    y.write_text(
        """
data:
    user_vocab: u.pkl
    item_vocab: i.pkl
    cate_vocab: c.pkl
model:
    layer_sizes: [10, 5]
    enable_BN: True
train:
    batch_size: 400
    EARLY_STOP: 10
"""
    )
    cfg = load_config(str(y), batch_size=500)
    assert cfg.layer_sizes == (10, 5)
    assert cfg.batch_size == 500      # override wins, like sequential.py:41
    assert cfg.early_stop == 10       # EARLY_STOP alias
    assert cfg.enable_bn is True


def test_missing_required_raises():
    with pytest.raises(ValueError, match="user_vocab"):
        load_config(model_type="clsr")


def test_bad_values_raise():
    with pytest.raises(ValueError):
        Config(user_vocab="u", item_vocab="i", cate_vocab="c",
               loss="not_a_loss").validate()
    with pytest.raises(ValueError):
        Config(user_vocab="u", item_vocab="i", cate_vocab="c",
               sequential_model="transformer").validate()
