"""Quality validation on synthetic data.

The reference's published numbers (Taobao AUC 0.8954 etc.) require the
Taobao dataset, which is not reachable from this environment (Google Drive,
zero egress — see PARITY.md C14).  This script is the stand-in quality
check: a larger synthetic dataset with planted category-affinity +
popularity signal, trained to convergence with early stopping for several
models.  Expectations:

  * every model clears AUC 0.5 by a wide margin (the signal is learnable);
  * CLSR and SLI-Rec (long+short fusion) match or beat GRU4Rec;
  * wauc early stopping and checkpoint-on-improvement engage.

Usage:  python scripts/quality_synthetic.py [--epochs 20] [--models clsr,gru4rec]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--models", default="clsr,sli_rec,gru4rec,din")
    ap.add_argument("--n_users", type=int, default=1500)
    ap.add_argument("--n_items", type=int, default=800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.trainer import Trainer

    workdir = args.out or tempfile.mkdtemp(prefix="clsr_quality_")
    print(f"dataset dir: {workdir}")
    paths = write_synthetic_dataset(
        workdir, n_users=args.n_users, n_items=args.n_items, n_cates=40,
        valid_num_ngs=4, test_num_ngs=49, seed=7)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    L = 30
    loaders = {
        name: SequenceLoader(parse_file(paths[name], uv, iv, cv),
                             max_seq_length=L)
        for name in ("train", "valid", "test")
    }
    n_train = len(loaders["train"].ds)
    print(f"train lines: {n_train}, valid: {len(loaders['valid'].ds)}, "
          f"test: {len(loaders['test'].ds)}")

    results = {}
    for model_type in args.models.split(","):
        cfg = Config(
            model_type=model_type, user_vocab="u", item_vocab="i",
            cate_vocab="c", max_seq_length=L, batch_size=256,
            train_num_ngs=4, valid_num_ngs=4, test_num_ngs=49,
            hidden_size=40, item_embedding_dim=32, cate_embedding_dim=8,
            user_embedding_dim=40, epochs=args.epochs, early_stop=4,
            show_step=0, save_model=True,
            model_dir=os.path.join(workdir, "model", model_type),
            seed=11,
        ).validate()
        model = get_model_class(model_type)(
            cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
        sample = next(loaders["train"].train_batches(
            cfg.batch_size, np.random.RandomState(0)))
        t0 = time.time()
        trainer = Trainer(model, cfg, sample)
        trainer.fit(loaders["train"], loaders["valid"])
        res = run_weighted_eval(trainer.eval_step, trainer.state,
                                loaders["test"], cfg, num_ngs=49)
        res["train_seconds"] = round(time.time() - t0, 1)
        res["best_epoch"] = trainer.best_epoch
        results[model_type] = res
        print(model_type, json.dumps(res))

    print("\n=== summary ===")
    for m, r in results.items():
        print(f"{m:10s} auc={r['auc']:.4f} wauc={r['wauc']:.4f} "
              f"mrr={r['mean_mrr']:.4f} ndcg@2={r.get('ndcg@2', 0):.4f} "
              f"best_epoch={r['best_epoch']} time={r['train_seconds']}s")
    with open(os.path.join(workdir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
