"""Cross-model quality tournament under the rigorous paired protocol
(VERDICT r3 item 1).

The reference's headline empirical claim is the cross-model ORDERING —
CLSR beats SLI-Rec / DIN / DIEN / GRU4Rec on GAUC
(/root/reference/README.md:47-59; SLI-Rec is CLSR's closest ancestor,
models/sequential/sli_rec.py:25-147).  The repo's previous cross-model
numbers were round-1 vintage: single seed, last-epoch eval — the exact
protocol the round-3 drift study proved unreliable (best-epoch restore
moves margins by more than most mechanism effects,
docs/RESULTS_r3.md:100-114).  This script re-runs the comparison under
the rigorous protocol:

  * >= 5 seeds, each seed = fresh dataset + fresh train seed;
  * the SAME dataset and train seed feed every model, so per-seed
    (CLSR - baseline) GAUC margins are PAIRED;
  * checkpoint on valid improvement, restore the BEST epoch before the
    test eval (the reference protocol, sequential.py:352-353);
  * fixed table sizes so all seeds of one model share one compiled
    program (TPU relay compiles cost 5-10 min; cache hits nothing);
  * populations: `taobao` (homogeneous drift) and `taobao_bimodal`
    (per-user alpha 0.1/0.9 — the regime disentangled long/short
    recommendation exists for, where round 3 proved adaptive fusion
    beats fixed fusion 7/7 seeds).

Datasets are shared with scripts/quality_drift_study.py (same
`ds_{scale}_{seed}` layout), so pointing --out at the same directory
reuses its generated data.

Round 5 (VERDICT r4 items 3/5): the script also drives
  * the reference's EXACT test protocol via --test_num_ngs 99
    (sequential.py:59 pins 1+99; the r4 cells used 1+49);
  * config-override arms via --extra/--tag (bf16 quality cell,
    length-bucketed training cell) — the tagged arm pairs seed-for-seed
    against the untagged model run on the SAME dataset.

Usage:
  python scripts/quality_tournament.py --scale taobao_bimodal \
      --seeds 3,4,5,6,7 --models clsr,sli_rec,din,dien,gru4rec \
      --epochs 10 --out /tmp/quality_r4
  python scripts/quality_tournament.py --scale taobao_bimodal \
      --models clsr --extra '{"compute_dtype": "bfloat16"}' --tag bf16
  python scripts/quality_tournament.py --summary --out /tmp/quality_r4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quality_drift_study import SCALES  # shared populations / dims

DEFAULT_MODELS = "clsr,sli_rec,din,dien,gru4rec"


def run_one(scale: str, seed: int, model_type: str, epochs: int, out: str,
            test_num_ngs: int = 49, extra: dict = None, tag: str = ""):
    sc = SCALES[scale]
    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_drift_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.trainer import Trainer

    ng_sfx = "" if test_num_ngs == 49 else f"_ng{test_num_ngs}"
    dsdir = os.path.join(out, f"ds_{scale}_{seed}{ng_sfx}")
    gen_keys = ("min_events", "max_events", "burst_len",
                "alpha_low", "alpha_high", "alpha_bimodal")
    if not os.path.exists(os.path.join(dsdir, "train_data")):
        write_drift_dataset(
            dsdir, n_users=sc["n_users"], n_items=sc["n_items"],
            n_cates=sc["n_cates"], valid_num_ngs=4,
            test_num_ngs=test_num_ngs,
            seed=seed, **{k: sc[k] for k in gen_keys if k in sc})
    paths = {n: os.path.join(dsdir, f"{n}_data")
             for n in ("train", "valid", "test")}
    paths.update({f"{n}_vocab": os.path.join(dsdir, f"{n}_vocab.pkl")
                  for n in ("user", "item", "cate")})
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    L = sc["max_seq_length"]
    loaders = {n: SequenceLoader(parse_file(paths[n], uv, iv, cv), L)
               for n in ("train", "valid", "test")}

    arm = model_type + (f"+{tag}" if tag else "")
    model_dir = os.path.join(out, f"ckpt_{scale}_{seed}_{arm}")
    cfg_kw = dict(
        model_type=model_type, user_vocab="u", item_vocab="i",
        cate_vocab="c", max_seq_length=L, batch_size=sc["batch_size"],
        train_num_ngs=4, valid_num_ngs=4, test_num_ngs=test_num_ngs,
        hidden_size=sc["hidden_size"],
        item_embedding_dim=sc["item_embedding_dim"],
        cate_embedding_dim=sc["cate_embedding_dim"],
        user_embedding_dim=sc["user_embedding_dim"],
        epochs=epochs, early_stop=4, show_step=0, save_model=True,
        model_dir=model_dir,
        seed=seed + 8, optimizer="lazyadam",
        resident_data="off",   # fixed program shapes across seeds
    )
    cfg_kw.update(extra or {})
    cfg = Config(**cfg_kw).validate()
    # FIXED table sizes (>= vocab) so every seed hits one compiled program
    n_users = sc["n_users"] + 8
    n_items = sc["n_items"] + 8
    n_cates = sc["n_cates"] + 8
    assert len(uv) <= n_users and len(iv) <= n_items and len(cv) <= n_cates
    model = get_model_class(model_type)(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    t0 = time.time()
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    trainer.fit(loaders["train"], loaders["valid"])
    trainer.load_latest(model_dir)   # best-valid epoch (ref protocol)
    res = run_weighted_eval(trainer.eval_step, trainer.state,
                            loaders["test"], cfg, num_ngs=test_num_ngs)
    import shutil
    shutil.rmtree(model_dir, ignore_errors=True)
    rec = dict(scale=scale, seed=seed, model=arm, epochs=epochs,
               test_num_ngs=test_num_ngs,
               best_epoch=trainer.best_epoch,
               train_seconds=round(time.time() - t0, 1), **res)
    with open(os.path.join(out, "tournament.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def summarize(out: str):
    path = os.path.join(out, "tournament.jsonl")
    runs = [json.loads(l) for l in open(path)] if os.path.exists(path) \
        else []
    by = {}
    for r in runs:   # last run wins per (scale, ngs, seed, model)
        by[(r["scale"], r.get("test_num_ngs", 49), r["seed"],
            r["model"])] = r
    for scale, ngs in sorted({(k[0], k[1]) for k in by}):
        sub = {k: v for k, v in by.items()
               if k[0] == scale and k[1] == ngs}
        seeds = sorted({k[2] for k in sub})
        models = sorted({k[3] for k in sub})
        print(f"\n=== {scale} 1+{ngs} test negatives "
              f"({len(seeds)} seeds) ===")
        for m in models:
            g = [sub[(scale, ngs, s, m)]["wauc"] for s in seeds
                 if (scale, ngs, s, m) in sub]
            print(f"{m:12s} GAUC mean={np.mean(g):.4f} "
                  f"std={np.std(g, ddof=1) if len(g) > 1 else 0:.4f} "
                  f"n={len(g)}")
        for m in models:
            if m == "clsr":
                continue
            pair_seeds = [s for s in seeds
                          if (scale, ngs, s, "clsr") in sub
                          and (scale, ngs, s, m) in sub]
            if len(pair_seeds) < 2:
                continue
            margins = np.array(
                [sub[(scale, ngs, s, "clsr")]["wauc"]
                 - sub[(scale, ngs, s, m)]["wauc"]
                 for s in pair_seeds])
            sem = margins.std(ddof=1) / np.sqrt(len(margins))
            print(f"paired clsr - {m:12s}: mean={margins.mean():+.4f} "
                  f"std={margins.std(ddof=1):.4f} sem={sem:.4f} "
                  f"wins={int((margins > 0).sum())}/{len(margins)} | "
                  f"mean > 2*sem: {margins.mean() > 2 * sem} | "
                  f"per-seed "
                  f"{[round(float(x), 4) for x in margins]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="taobao", choices=list(SCALES))
    ap.add_argument("--seeds", default="3,4,5,6,7")
    ap.add_argument("--models", default=DEFAULT_MODELS)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="/tmp/quality_r4")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--summary", action="store_true")
    ap.add_argument("--test_num_ngs", type=int, default=49,
                    help="test negatives per positive (reference protocol"
                         " pins 99, sequential.py:59)")
    ap.add_argument("--extra", default="",
                    help="JSON config overrides for every run (arm)")
    ap.add_argument("--tag", default="",
                    help="arm label recorded as model+tag")
    args = ap.parse_args()
    extra = json.loads(args.extra) if args.extra else None
    if extra and not args.tag:
        ap.error("--extra requires --tag (so the arm is distinguishable)")

    os.makedirs(args.out, exist_ok=True)
    if args.summary:
        summarize(args.out)
        return 0

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    done = set()
    path = os.path.join(args.out, "tournament.jsonl")
    if os.path.exists(path):
        for l in open(path):
            r = json.loads(l)
            done.add((r["scale"], r.get("test_num_ngs", 49), r["seed"],
                      r["model"], r["epochs"]))
    # model-major order: all seeds of one model back-to-back, so each
    # compiled program is paid for once and then hit from cache
    for model_type in args.models.split(","):
        arm = model_type + (f"+{args.tag}" if args.tag else "")
        for seed in (int(s) for s in args.seeds.split(",")):
            key = (args.scale, args.test_num_ngs, seed, arm, args.epochs)
            if key in done:
                print(f"skip {key} (already recorded)", flush=True)
                continue
            run_one(args.scale, seed, model_type, args.epochs, args.out,
                    test_num_ngs=args.test_num_ngs, extra=extra,
                    tag=args.tag)
    summarize(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
