"""CLSR ablation study on synthetic data.

Mirrors the reference paper's ablations: full CLSR vs manual alpha (no
learned fusion), no interest-evolution GRU, bpr vs triplet contrastive,
and contrastive weight 0.  Evidence that the disentanglement machinery
(fusion gate, contrastive supervision) contributes measurably.

Usage: python scripts/ablation_synthetic.py [--epochs 12]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "full_triplet": {},
    "bpr": {"contrastive_loss": "bpr"},
    "no_contrastive": {"contrastive_loss_weight": 0.0,
                       "discrepancy_loss_weight": 0.0},
    "manual_alpha": {"manual_alpha": True, "manual_alpha_value": 0.5},
    "no_interest_evolve": {"interest_evolve": False},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default=None)
    ap.add_argument("--drift", action="store_true",
                    help="use the planted long/short interest-drift "
                         "generator (write_drift_dataset) so the "
                         "disentanglement losses have signal to exploit")
    ap.add_argument("--seed", type=int, default=3,
                    help="dataset seed (train seed = seed + 8)")
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variants to run")
    ap.add_argument("--mesh", default=None,
                    help="DxM: run on a (data, model) mesh (e.g. 4x2 "
                         "with the CPU XLA_FLAGS device count) — "
                         "exercises mesh-compact + flat batch")
    ap.add_argument("--optimizer", default=None,
                    help="override the optimizer (lazyadam engages the "
                         "compact/pmn row engines)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process (env "
                         "JAX_PLATFORMS is not enough — CLAUDE.md)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import (write_drift_dataset,
                                         write_synthetic_dataset)
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.trainer import Trainer

    workdir = args.out or tempfile.mkdtemp(prefix="clsr_ablation_")
    if args.drift:
        paths = write_drift_dataset(workdir, n_users=1200, n_items=600,
                                    n_cates=30, valid_num_ngs=4,
                                    test_num_ngs=49, seed=args.seed)
    else:
        paths = write_synthetic_dataset(workdir, n_users=1200, n_items=600,
                                        n_cates=30, valid_num_ngs=4,
                                        test_num_ngs=49, seed=args.seed)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    L = 30
    loaders = {n: SequenceLoader(parse_file(paths[n], uv, iv, cv), L)
               for n in ("train", "valid", "test")}

    results = {}
    chosen = (dict(VARIANTS) if args.variants is None else
              {k: VARIANTS[k] for k in args.variants.split(",")})
    for name, overrides in chosen.items():
        cfg = Config(
            model_type="clsr", user_vocab="u", item_vocab="i",
            cate_vocab="c", max_seq_length=L, batch_size=256,
            train_num_ngs=4, valid_num_ngs=4, test_num_ngs=49,
            hidden_size=40, item_embedding_dim=32, cate_embedding_dim=8,
            user_embedding_dim=40, epochs=args.epochs, early_stop=4,
            show_step=0, save_model=False, seed=args.seed + 8,
            **(dict(data_parallel=int(args.mesh.split("x")[0]),
                    model_parallel=int(args.mesh.split("x")[1]))
               if args.mesh else {}),
            **(dict(optimizer=args.optimizer) if args.optimizer else {}),
            **overrides,
        ).validate()
        model = get_model_class("clsr")(
            cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
        sample = next(loaders["train"].train_batches(
            cfg.batch_size, np.random.RandomState(0)))
        t0 = time.time()
        trainer = Trainer(model, cfg, sample, log=lambda *a: None)
        trainer.fit(loaders["train"], loaders["valid"])
        res = run_weighted_eval(trainer.eval_step, trainer.state,
                                loaders["test"], cfg, num_ngs=49,
                                calc_mean_alpha=not cfg.manual_alpha)
        res["train_seconds"] = round(time.time() - t0, 1)
        res["best_epoch"] = trainer.best_epoch
        results[name] = res
        print(name, json.dumps(res), flush=True)

    print("\n=== ablation summary ===")
    if args.drift:
        planted = json.load(open(paths["alphas"]))
        print(f"planted mean long-term mixture: "
              f"{np.mean(list(planted.values())):.3f}")
    for n, r in results.items():
        print(f"{n:20s} auc={r['auc']:.4f} wauc={r['wauc']:.4f} "
              f"ndcg@2={r.get('ndcg@2', 0):.4f} "
              f"alpha={r.get('mean_alpha', '-')}")
    with open(os.path.join(workdir, "ablation.json"), "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
