"""CLI end-to-end smoke, prediction dump, summary writer."""

import json
import os

import numpy as np
import pytest


def test_cli_synthetic_end_to_end(tmp_path, capsys):
    from clsr_tpu.cli import main
    rc = main([
        "--dataset", "synthetic", "--model", "GRU4REC", "--epochs", "1",
        "--batch_size", "32", "--data_path", str(tmp_path),
        "--test_num_ngs", "9", "--val_num_ngs", "4", "--show_step", "0",
        "--seed", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "auc" in out and "wauc" in out
    # checkpoints written on improvement, keyed by <dataset>-<model>
    model_dir = tmp_path / "model" / "synthetic-gru4rec"
    assert model_dir.exists() and any(model_dir.iterdir())


def test_predict_to_file(tmp_path):
    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import predict_to_file
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step

    paths = write_synthetic_dataset(str(tmp_path), n_users=15, n_items=30,
                                    n_cates=5, test_num_ngs=4)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    ds = parse_file(paths["test"], uv, iv, cv)
    loader = SequenceLoader(ds, max_seq_length=6)
    cfg = Config(model_type="gru4rec", user_vocab="u", item_vocab="i",
                 cate_vocab="c", max_seq_length=6, batch_size=16,
                 hidden_size=8, item_embedding_dim=8, cate_embedding_dim=4,
                 user_embedding_dim=8, layer_sizes=(8,),
                 activation=("relu",), seed=0).validate()
    model = get_model_class("gru4rec")(cfg=cfg, n_users=len(uv),
                                       n_items=len(iv), n_cates=len(cv))
    batch = next(loader.eval_batches(group_size=1, batch_groups=16))
    state = create_train_state(model, cfg, batch)
    out_path = str(tmp_path / "output.txt")
    predict_to_file(make_eval_step(model, cfg), state, loader, cfg, out_path)
    with open(out_path) as f:
        scores = [float(line) for line in f.read().split()]
    assert len(scores) == len(ds)        # one score per input line
    assert all(0.0 <= s <= 1.0 for s in scores)  # sigmoid output


def test_summary_writer(tmp_path):
    from clsr_tpu.utils.summaries import SummaryWriter
    w = SummaryWriter(str(tmp_path / "logs"))
    w.scalars(10, {"loss": 1.5, "data_loss": 1.2})
    w.scalars(20, {"loss": 1.1})
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "logs" / "scalars.jsonl")]
    assert lines[0]["step"] == 10 and lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 20


def test_timer():
    import time
    from clsr_tpu.utils.timer import Timer
    with Timer() as t:
        time.sleep(0.01)
    assert t.interval >= 0.009
    with pytest.raises(ValueError):
        Timer().stop()


@pytest.mark.slow
def test_cli_mesh_end_to_end(tmp_path, capsys):
    """CLI -> Trainer mesh wiring: --data_parallel/--model_parallel on
    the virtual CPU mesh (flat batch auto-on, mesh-compact lazyadam)."""
    from clsr_tpu.cli import main
    rc = main([
        "--dataset", "synthetic", "--model", "GRU4REC", "--epochs", "1",
        "--batch_size", "32", "--data_path", str(tmp_path),
        "--test_num_ngs", "9", "--val_num_ngs", "4", "--show_step", "0",
        "--seed", "1", "--data_parallel", "4", "--model_parallel", "2",
        "--optimizer", "lazyadam",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "auc" in out and "wauc" in out


def test_prefetch_abandoned_consumer_releases_producer():
    """An early-stopped consumer must not pin the producer (and its epoch
    arrays) behind a blocked q.put — the round-5 multi-run OOM
    (data/prefetch.py abandonment safety)."""
    import gc
    import threading
    import time as _time
    import weakref

    import numpy as np

    from clsr_tpu.data.prefetch import prefetch_to_device

    n_before = threading.active_count()
    big = [np.zeros(1000) for _ in range(50)]
    refs = [weakref.ref(b) for b in big]

    def gen():
        for b in big:
            yield b

    it = prefetch_to_device(gen(), depth=2)
    next(it)          # start the producer; it blocks on the full queue
    it.close()        # abandon mid-stream
    del it, big, gen
    for _ in range(100):
        gc.collect()
        if (threading.active_count() <= n_before
                and sum(r() is not None for r in refs) <= 4):
            break
        _time.sleep(0.05)
    # producer exited and dropped its references (a few items may
    # legitimately linger in flight)
    assert threading.active_count() <= n_before + 1
    assert sum(r() is not None for r in refs) <= 6
