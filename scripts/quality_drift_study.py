"""Multi-seed drift-quality study at scale (VERDICT r2 item 4).

Round 2's drift-synthetic margin (+0.0020 GAUC full-vs-no-contrastive,
2/3 seeds, one reversal) was the same order as seed noise at its
deliberately small scale (1200 users, L=30).  This study scales the
planted long/short-divergence benchmark until the comparison carries
statistical weight:

  * taobao scale:   5000 users, 1500 items, 50 cates, 40-80 events,
                    L=50 — ~300k train rows/seed;
  * kuaishou scale: 1500 users, 1500 items, 50 cates, 200-300 events,
                    L=250 — the pmn-engine shape.

For each dataset seed the SAME data and train seed feed every variant,
so the per-seed (full - no_contrastive) margins are PAIRED; the summary
reports mean +- std of the paired margin and whether mean > 2 * sem.

Model table sizes are FIXED per scale (>= vocab size) so every seed
shares one compiled program — a TPU relay compile costs 5-10 minutes
(CLAUDE.md), a cache hit nothing.  resident_data=off for the same
reason (the resident program's shapes depend on the dataset row count).

Results append to <out>/runs.jsonl as they finish (a killed run keeps
its partial data); the summary recomputes from the file.

Usage:
  python scripts/quality_drift_study.py --scale taobao \
      --seeds 3,4,5,6,7 --epochs 10 --out /tmp/drift_study
  python scripts/quality_drift_study.py --summary --out /tmp/drift_study
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALES = {
    "taobao": dict(n_users=5000, n_items=1500, n_cates=50,
                   min_events=40, max_events=80, burst_len=5,
                   max_seq_length=50, batch_size=512,
                   hidden_size=40, item_embedding_dim=32,
                   cate_embedding_dim=8, user_embedding_dim=40),
    # same population as 'taobao' but r2's SHORT per-user histories:
    # disentangles "more users" from "longer histories" — the aux
    # contrastive supervision is a prior, and priors matter when
    # per-user data is scarce
    "taobao_short": dict(n_users=5000, n_items=1500, n_cates=50,
                         min_events=20, max_events=40, burst_len=5,
                         max_seq_length=50, batch_size=512,
                         hidden_size=40, item_embedding_dim=32,
                         cate_embedding_dim=8, user_embedding_dim=40),
    # bimodal fusion population (alpha 0.1 or 0.9 per user, coin flip):
    # a global fusion weight cannot serve both cohorts — the regime the
    # adaptive gate + disentanglement supervision exist for
    "taobao_bimodal": dict(n_users=5000, n_items=1500, n_cates=50,
                           min_events=20, max_events=40, burst_len=5,
                           alpha_low=0.1, alpha_high=0.9,
                           alpha_bimodal=True,
                           max_seq_length=50, batch_size=512,
                           hidden_size=40, item_embedding_dim=32,
                           cate_embedding_dim=8, user_embedding_dim=40),
    # scarce-data population (VERDICT r3 item 6): 10-20 events/user —
    # per-user evidence too thin for the task signal alone (the paper's
    # cold-ish users).  4x the users keeps total train rows comparable
    # to 'taobao' (~300k), so any margin change is attributable to
    # per-user scarcity, not dataset size
    "taobao_scarce": dict(n_users=20000, n_items=1500, n_cates=50,
                          min_events=10, max_events=20, burst_len=4,
                          max_seq_length=50, batch_size=512,
                          hidden_size=40, item_embedding_dim=32,
                          cate_embedding_dim=8, user_embedding_dim=40),
    "kuaishou": dict(n_users=1500, n_items=1500, n_cates=50,
                     min_events=200, max_events=300, burst_len=10,
                     max_seq_length=250, batch_size=256,
                     hidden_size=40, item_embedding_dim=32,
                     cate_embedding_dim=8, user_embedding_dim=40),
    # CPU-mesh e2e scale (4x2 virtual mesh; sized for a 4-core host)
    "mesh": dict(n_users=2000, n_items=800, n_cates=40,
                 min_events=30, max_events=60, burst_len=5,
                 max_seq_length=40, batch_size=256,
                 hidden_size=40, item_embedding_dim=32,
                 cate_embedding_dim=8, user_embedding_dim=40),
    # mechanics smoke test (CPU-sized; not a quality claim)
    "smoke": dict(n_users=80, n_items=120, n_cates=12,
                  min_events=10, max_events=16, burst_len=4,
                  max_seq_length=10, batch_size=64,
                  hidden_size=12, item_embedding_dim=8,
                  cate_embedding_dim=4, user_embedding_dim=12),
}

VARIANTS = {
    "full_triplet": {},
    "no_contrastive": {"contrastive_loss_weight": 0.0,
                       "discrepancy_loss_weight": 0.0},
    "manual_alpha": {"manual_alpha": True, "manual_alpha_value": 0.5},
    # the paper's supervised fusion-weight loss (attn_loss_weight,
    # deeprec_utils.py:425) — defined but never added by the reference;
    # the repo built it round 1 (losses.py:attn_loss_fn) and VERDICT r3
    # item 6 asks for it in an ablation arm
    "attn_loss": {"use_attn_loss": True},
}


def run_one(scale: str, seed: int, variant: str, epochs: int, out: str,
            mesh=None):
    sc = SCALES[scale]
    from clsr_tpu.config import Config
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_drift_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import run_weighted_eval
    from clsr_tpu.training.trainer import Trainer

    dsdir = os.path.join(out, f"ds_{scale}_{seed}")
    gen_keys = ("min_events", "max_events", "burst_len",
                "alpha_low", "alpha_high", "alpha_bimodal")
    if not os.path.exists(os.path.join(dsdir, "train_data")):
        write_drift_dataset(
            dsdir, n_users=sc["n_users"], n_items=sc["n_items"],
            n_cates=sc["n_cates"], valid_num_ngs=4, test_num_ngs=49,
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

    # reference protocol: checkpoint on valid improvement, restore the
    # BEST epoch for the test eval (sequential.py:352-353) — testing
    # the final early-stopped state instead injects 4-epochs-past-best
    # overfit noise into exactly the margin under study
    model_dir = os.path.join(out, f"ckpt_{scale}_{seed}_{variant}")
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=L, batch_size=sc["batch_size"], train_num_ngs=4,
        valid_num_ngs=4, test_num_ngs=49, hidden_size=sc["hidden_size"],
        item_embedding_dim=sc["item_embedding_dim"],
        cate_embedding_dim=sc["cate_embedding_dim"],
        user_embedding_dim=sc["user_embedding_dim"],
        epochs=epochs, early_stop=4, show_step=0, save_model=True,
        model_dir=model_dir,
        seed=seed + 8, optimizer="lazyadam",
        resident_data="off",   # fixed program shapes across seeds
        **(dict(data_parallel=mesh[0], model_parallel=mesh[1])
           if mesh else {}),
        **VARIANTS[variant],
    ).validate()
    # FIXED table sizes (>= vocab) so every seed hits one compiled program
    n_users = sc["n_users"] + 8
    n_items = sc["n_items"] + 8
    n_cates = sc["n_cates"] + 8
    assert len(uv) <= n_users and len(iv) <= n_items and len(cv) <= n_cates
    model = get_model_class("clsr")(
        cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    t0 = time.time()
    trainer = Trainer(model, cfg, sample, log=lambda *a: None)
    trainer.fit(loaders["train"], loaders["valid"])
    trainer.load_latest(model_dir)   # best-valid epoch (ref protocol)
    res = run_weighted_eval(trainer.eval_step, trainer.state,
                            loaders["test"], cfg, num_ngs=49,
                            calc_mean_alpha=not cfg.manual_alpha)
    import shutil
    shutil.rmtree(model_dir, ignore_errors=True)
    rec = dict(scale=scale, seed=seed, variant=variant, epochs=epochs,
               best_epoch=trainer.best_epoch,
               train_seconds=round(time.time() - t0, 1), **res)
    with open(os.path.join(out, "runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def summarize(out: str):
    path = os.path.join(out, "runs.jsonl")
    runs = [json.loads(l) for l in open(path)] if os.path.exists(path) \
        else []
    by = {}
    for r in runs:   # last run wins per (scale, seed, variant)
        by[(r["scale"], r["seed"], r["variant"])] = r
    for scale in sorted({k[0] for k in by}):
        seeds = sorted({k[1] for k in by if k[0] == scale})
        print(f"\n=== {scale} ({len(seeds)} seeds) ===")
        variants = sorted({k[2] for k in by if k[0] == scale})
        for v in variants:
            g = [by[(scale, s, v)]["wauc"] for s in seeds
                 if (scale, s, v) in by]
            print(f"{v:18s} GAUC mean={np.mean(g):.4f} "
                  f"std={np.std(g, ddof=1) if len(g) > 1 else 0:.4f} "
                  f"n={len(g)}")
        # paired margins: every variant vs the no-aux-loss control
        for v in variants:
            if v == "no_contrastive":
                continue
            pair_seeds = [s for s in seeds
                          if (scale, s, v) in by
                          and (scale, s, "no_contrastive") in by]
            if len(pair_seeds) < 2:
                continue
            margins = np.array(
                [by[(scale, s, v)]["wauc"]
                 - by[(scale, s, "no_contrastive")]["wauc"]
                 for s in pair_seeds])
            sem = margins.std(ddof=1) / np.sqrt(len(margins))
            print(f"paired {v} - no_contrastive: "
                  f"mean={margins.mean():+.4f} std={margins.std(ddof=1):.4f} "
                  f"sem={sem:.4f} wins={int((margins > 0).sum())}/"
                  f"{len(margins)} | mean > 2*sem: "
                  f"{margins.mean() > 2 * sem} | per-seed "
                  f"{ {s: round(float(m), 4) for s, m in zip(pair_seeds, margins)} }")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="taobao", choices=list(SCALES))
    ap.add_argument("--seeds", default="3,4,5,6,7")
    ap.add_argument("--variants", default="full_triplet,no_contrastive")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="/tmp/drift_study")
    ap.add_argument("--mesh", default=None, help="DxM mesh (CPU use)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--summary", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.summary:
        summarize(args.out)
        return 0

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))
    mesh = ([int(x) for x in args.mesh.split("x")] if args.mesh else None)

    done = set()
    path = os.path.join(args.out, "runs.jsonl")
    if os.path.exists(path):
        for l in open(path):
            r = json.loads(l)
            done.add((r["scale"], r["seed"], r["variant"], r["epochs"]))
    for seed in (int(s) for s in args.seeds.split(",")):
        for variant in args.variants.split(","):
            key = (args.scale, seed, variant, args.epochs)
            if key in done:
                print(f"skip {key} (already recorded)", flush=True)
                continue
            run_one(args.scale, seed, variant, args.epochs, args.out,
                    mesh=mesh)
    summarize(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
