"""Trainer end-to-end on the (data, model) mesh + Time4ALSTM parity."""

import jax
import jax.numpy as jnp
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.ops.rnn import Time4ALSTM, Time4LSTM
from clsr_tpu.training.evaluator import run_weighted_eval
from clsr_tpu.training.trainer import Trainer

L = 8


def test_trainer_fits_on_mesh(tmp_path):
    paths = write_synthetic_dataset(str(tmp_path), n_users=20, n_items=40,
                                    n_cates=6, test_num_ngs=4)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    loaders = {
        n: SequenceLoader(parse_file(paths[n], uv, iv, cv), L)
        for n in ("train", "valid", "test")
    }
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=16, train_num_ngs=2, valid_num_ngs=4,
        test_num_ngs=4, hidden_size=12, item_embedding_dim=8,
        cate_embedding_dim=4, user_embedding_dim=12, layer_sizes=(16, 8),
        att_fcn_layer_sizes=(12, 6), epochs=1, show_step=0,
        save_model=False, seed=0,
        data_parallel=4, model_parallel=2,   # 4x2 over the 8 CPU devices
    ).validate()
    model = get_model_class("clsr")(cfg=cfg, n_users=len(uv),
                                    n_items=len(iv), n_cates=len(cv))
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    assert trainer._mesh is not None
    # mesh_flat_batch='auto' + model_parallel>1 + divisible batch ->
    # flat data parallelism over all 8 devices (parallel/embedding.py)
    assert trainer._flat_batch
    trainer.fit(loaders["train"], loaders["valid"])
    res = run_weighted_eval(trainer.eval_step, trainer.state,
                            loaders["test"], cfg, num_ngs=4)
    assert 0.0 <= res["auc"] <= 1.0


def test_time4alstm_blend_is_identity_but_runs():
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 5, 4, 6
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    tl = jnp.asarray(rng.rand(B, T).astype(np.float32))
    tn = jnp.asarray(rng.rand(B, T).astype(np.float32))
    att = jnp.asarray(rng.rand(B, T).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    mod_a = Time4ALSTM(H)
    va = mod_a.init(jax.random.PRNGKey(0), x, tl, tn, att, mask)
    outs_a, _ = mod_a.apply(va, x, tl, tn, att, mask)

    mod = Time4LSTM(H)
    vb = {"params": va["params"]["t4l"]}
    outs_b, _ = mod.apply(vb, x, tl, tn, mask)
    # the attention blend a*m + (1-a)*m is the identity (preserved quirk)
    np.testing.assert_allclose(np.asarray(outs_a), np.asarray(outs_b),
                               atol=1e-6)


def test_trainer_mesh_multi_step(tmp_path):
    """Mesh path with K-steps-per-dispatch enabled."""
    paths = write_synthetic_dataset(str(tmp_path), n_users=20, n_items=40,
                                    n_cates=6, test_num_ngs=4)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    loaders = {
        n: SequenceLoader(parse_file(paths[n], uv, iv, cv), L)
        for n in ("train", "valid")
    }
    cfg = Config(
        model_type="gru4rec", user_vocab="u", item_vocab="i",
        cate_vocab="c", max_seq_length=L, batch_size=16, train_num_ngs=2,
        valid_num_ngs=4, hidden_size=8, item_embedding_dim=8,
        cate_embedding_dim=4, user_embedding_dim=8, layer_sizes=(8,),
        activation=("relu",), epochs=1, show_step=0, save_model=False,
        seed=0, data_parallel=4, model_parallel=2, train_steps_per_call=3,
    ).validate()
    model = get_model_class("gru4rec")(cfg=cfg, n_users=len(uv),
                                       n_items=len(iv), n_cates=len(cv))
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    assert trainer._mesh is not None and trainer._multi_step is not None
    trainer.fit(loaders["train"], loaders["valid"])
    assert trainer.eval_history


def test_mesh_checkpoint_restores_on_single_device(tmp_path):
    """Real user flow: train on a mesh (sharded pmn state), checkpoint,
    restore into a single-device trainer — predictions must match the
    mesh trainer's eval exactly (params are synced views at the jit
    boundary, so what is saved is always fresh)."""
    paths = write_synthetic_dataset(str(tmp_path / "data"), n_users=20,
                                    n_items=40, n_cates=6, test_num_ngs=4)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    loaders = {
        n: SequenceLoader(parse_file(paths[n], uv, iv, cv), L)
        for n in ("train", "valid", "test")
    }

    def make_cfg(dp, mp):
        return Config(
            model_type="gru4rec", user_vocab="u", item_vocab="i",
            cate_vocab="c", max_seq_length=L, batch_size=16,
            train_num_ngs=2, valid_num_ngs=4, test_num_ngs=4,
            hidden_size=8, item_embedding_dim=8, cate_embedding_dim=4,
            user_embedding_dim=8, layer_sizes=(8,), activation=("relu",),
            optimizer="lazyadam", enable_bn=False, epochs=1, show_step=0,
            save_model=False, seed=0, data_parallel=dp, model_parallel=mp,
        ).validate()

    cfg = make_cfg(4, 2)
    model = get_model_class("gru4rec")(cfg=cfg, n_users=len(uv),
                                       n_items=len(iv), n_cates=len(cv))
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    assert trainer._mesh is not None and trainer._flat_batch
    trainer.fit(loaders["train"], loaders["valid"])
    ckpt_dir = str(tmp_path / "ckpt")
    trainer.save(ckpt_dir)

    cfg1 = make_cfg(1, 1)
    model1 = get_model_class("gru4rec")(cfg=cfg1, n_users=len(uv),
                                        n_items=len(iv), n_cates=len(cv))
    single = Trainer(model1, cfg1, sample, log=lambda *a: None)
    single.load(ckpt_dir)

    batch = next(iter(loaders["test"].eval_batches(5, 8)))
    p_mesh, _ = trainer.eval_step(trainer.state, batch)
    p_single, _ = single.eval_step(single.state, batch)
    np.testing.assert_allclose(np.asarray(p_single), np.asarray(p_mesh),
                               rtol=1e-5, atol=1e-6)
