"""Experiment driver.

TPU-native counterpart of the reference quick-start script
(examples/00_quick_start/sequential.py:1-381): flag parsing, per-dataset
settings (taobao: max_seq 50 / time_unit 's' / ndcg@2;4;6+hit; kuaishou:
max_seq 250 / 'ms' / ndcg@1;2 — sequential.py:77-87), model factory over
the YAML configs, train/test orchestration with ETL-on-demand.

Usage:
    python -m clsr_tpu.cli --dataset taobao --model CLSR
    python -m clsr_tpu.cli --dataset taobao --model CLSR --only_test
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="clsr_tpu experiment driver")
    # mirrors sequential.py:36-68
    p.add_argument("--dataset", default="taobao",
                   choices=["taobao", "kuaishou", "synthetic"])
    p.add_argument("--val_num_ngs", type=int, default=4)
    p.add_argument("--test_num_ngs", type=int, default=99)
    p.add_argument("--batch_size", type=int, default=500)
    p.add_argument("--save_path", default="")
    p.add_argument("--contrastive_loss", default="triplet",
                   choices=["bpr", "triplet"])
    p.add_argument("--contrastive_length_threshold", type=int, default=5)
    p.add_argument("--contrastive_recent_k", type=int, default=3)
    p.add_argument("--name", default=None,
                   help="experiment name (default: <dataset>-<model>); "
                        "keys the checkpoint/summary dirs")
    p.add_argument("--model", default="CLSR")
    p.add_argument("--only_test", action="store_true")
    p.add_argument("--write_prediction_to_file", action="store_true")
    p.add_argument("--manual_alpha", action="store_true")
    p.add_argument("--manual_alpha_value", type=float, default=0.5)
    p.add_argument("--no_interest_evolve", dest="interest_evolve",
                   action="store_false")
    p.add_argument("--no_predict_long_short", dest="predict_long_short",
                   action="store_false")
    p.add_argument("--is_clip_norm", type=int, default=1)
    p.add_argument("--sequential_model", default="time4lstm",
                   choices=["gru", "lstm", "time4lstm"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--early_stop", type=int, default=5)
    p.add_argument("--data_path", default=os.path.join(
        "tests", "resources", "deeprec", "sequential"))
    p.add_argument("--train_num_ngs", type=int, default=4)
    p.add_argument("--sample_rate", type=float, default=1.0)
    p.add_argument("--embed_l2", type=float, default=1e-6)
    p.add_argument("--layer_l2", type=float, default=1e-6)
    p.add_argument("--attn_loss_weight", type=float, default=0.001)
    p.add_argument("--triplet_margin", type=float, default=1.0)
    p.add_argument("--discrepancy_loss_weight", type=float, default=0.01)
    p.add_argument("--contrastive_loss_weight", type=float, default=0.1)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--show_step", type=int, default=500)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--raw_data", default=None,
                   help="raw interaction CSV for on-demand preprocessing")
    p.add_argument("--no_history_expanding", dest="is_history_expanding",
                   action="store_false",
                   help="one line per user instead of expanding prefixes "
                        "(sequential_reviews.py:441-523)")
    # ablation iterator variants (reference Recent/Shuffle SA iterators,
    # sequential_iterator.py:735-793)
    p.add_argument("--counterfactual_recent_k", type=int, default=None,
                   help="keep only the last k history events (RecentSA)")
    p.add_argument("--shuffle_history_seed", type=int, default=None,
                   help="fixed per-user history shuffle (ShuffleSA)")
    # TPU-native extras
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--mesh_flat_batch", default="auto",
                   choices=("auto", "on", "off"),
                   help="shard the batch over BOTH mesh axes "
                        "(parallel/embedding.py flat mode)")
    p.add_argument("--mesh_update_routing", default="broadcast",
                   choices=("broadcast", "owner"),
                   help="mesh-compact gradient merge: broadcast the full "
                        "(id, grad) stream, or route O(M/m) per-owner "
                        "buckets (docs/SCALING.md)")
    p.add_argument("--mesh_owner_capacity", type=float, default=4.0,
                   help="per-owner bucket slots = ceil(f * Mi / m) for "
                        "owner routing; overflow is counted and warned")
    p.add_argument("--mesh_owner_overflow", default="fallback",
                   choices=("fallback", "drop"),
                   help="owner-bucket overflow: lossless broadcast-merge "
                        "fallback for that step (default), or round-3 "
                        "drop semantics (docs/SCALING.md)")
    p.add_argument("--mesh_row_layout", default="auto",
                   choices=("auto", "interleaved", "contiguous"),
                   help="physical row layout of model-sharded tables "
                        "(parallel/rowmap.py; auto = interleaved iff "
                        "owner routing)")
    p.add_argument("--optimizer", default=None,
                   help="override the YAML optimizer (adam/lazyadam/"
                        "adagrad/ftrl/padagrad/pgd/...)")
    p.add_argument("--train_steps_per_call", type=int, default=None,
                   help="K optimizer steps per device dispatch")
    p.add_argument("--autosave_every_calls", type=int, default=0,
                   help="persist full run state every N train dispatches "
                        "for exact mid-epoch resume (resident path; "
                        "training/checkpoint.py)")
    p.add_argument("--resume", action="store_true",
                   help="resume a killed run from <model_dir>/autosave "
                        "(bit-identical continuation)")
    p.add_argument("--length_buckets", default=None,
                   help="length-aware batching on the resident path: "
                        "'auto', comma edges (e.g. '16'), or 'off' "
                        "(data/resident.py:bucket_rows)")
    p.add_argument("--resident_round_rows", type=int, default=None,
                   help="round resident row counts up to this multiple "
                        "(stable program shapes across datasets)")
    p.add_argument("--resident_data", default="auto",
                   choices=["auto", "on", "off"],
                   help="device-resident train data (data/resident.py)")
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--embedding_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16 table storage (requires lazyadam)")
    p.add_argument("--use_pallas_train_attention", default=None,
                   choices=["auto", "on", "off"],
                   help="fused two-pass train-mode attention scorer "
                        "(ops/pallas_attention.py; single-device steps)")
    p.add_argument("--use_pallas_eval_attention", default=None,
                   choices=["auto", "on", "off"],
                   help="fused Pallas eval attention scorer "
                        "(ops/pallas_attention.py; single-device eval; "
                        "auto = on for the TPU backend)")
    p.add_argument("--attention_block_size", type=int, default=None,
                   help=">0: blockwise long-context attention "
                        "(needs enable_bn False)")
    p.add_argument("--write_histograms", action="store_true",
                   help="device-computed activation/embedding histograms "
                        "at the show_step cadence (the reference's "
                        "tf.summary.histogram stream; JSONL + "
                        "TensorBoard when --write_tfevents)")
    p.add_argument("--write_tfevents", action="store_true",
                   help="TensorBoard event files next to the JSONL "
                        "scalars (needs tensorflow importable)")
    p.add_argument("--etl_processes", type=int, default=1,
                   help="parallel workers for expanding-history ETL")
    p.add_argument("--etl_native", action="store_true",
                   help="C++ expanding-history generation (numeric-id "
                        "datasets; falls back to Python otherwise)")
    p.add_argument("--etl_format", default="tsv", choices=["tsv", "packed"],
                   help="ETL output: expanding-history TSVs (reference "
                        "layout) or the O(events) packed binary "
                        "(data/packed.py)")
    p.add_argument("--data_format", default="auto",
                   choices=["auto", "tsv", "packed"],
                   help="training input: auto = packed.npz when present "
                        "(unless an ablation iterator needs the TSV path)")
    return p


def dataset_settings(dataset: str):
    """sequential.py:77-87."""
    if dataset == "kuaishou":
        return dict(pairwise_metrics=("mean_mrr", "ndcg@1;2"),
                    weighted_metrics=("wauc",), max_seq_length=250,
                    time_unit="ms")
    return dict(pairwise_metrics=("mean_mrr", "ndcg@2;4;6", "hit@2;4;6"),
                weighted_metrics=("wauc",), max_seq_length=50, time_unit="s")


def make_config(args) -> "Config":
    from clsr_tpu.config import load_config

    model_key = args.model.lower()
    yaml_name = {"slirec": "sli_rec", "a2svd": "asvd"}.get(model_key,
                                                           model_key)
    yaml_file = os.path.join(CONFIG_DIR, f"{yaml_name}.yaml")
    if not os.path.exists(yaml_file):
        yaml_file = None

    ds = dataset_settings(args.dataset)
    data_dir = os.path.join(args.data_path, args.dataset)
    name = args.name or f"{args.dataset}-{args.model.lower()}"
    model_dir = os.path.join(args.data_path, "model", name)
    summary_dir = os.path.join(args.data_path, "summary", name)

    return load_config(
        yaml_file,
        model_type=model_key,
        user_vocab=os.path.join(data_dir, "user_vocab.pkl"),
        item_vocab=os.path.join(data_dir, "item_vocab.pkl"),
        cate_vocab=os.path.join(data_dir, "category_vocab.pkl"),
        batch_size=args.batch_size,
        epochs=args.epochs,
        early_stop=args.early_stop,
        train_num_ngs=args.train_num_ngs,
        valid_num_ngs=args.val_num_ngs,
        test_num_ngs=args.test_num_ngs,
        embed_l2=args.embed_l2,
        layer_l2=args.layer_l2,
        learning_rate=args.learning_rate,
        show_step=args.show_step,
        contrastive_loss=args.contrastive_loss,
        contrastive_length_threshold=args.contrastive_length_threshold,
        contrastive_recent_k=args.contrastive_recent_k,
        triplet_margin=args.triplet_margin,
        discrepancy_loss_weight=args.discrepancy_loss_weight,
        contrastive_loss_weight=args.contrastive_loss_weight,
        attn_loss_weight=args.attn_loss_weight,
        manual_alpha=args.manual_alpha,
        manual_alpha_value=args.manual_alpha_value,
        interest_evolve=args.interest_evolve,
        predict_long_short=args.predict_long_short,
        is_clip_norm=bool(args.is_clip_norm),
        sequential_model=args.sequential_model,
        seed=args.seed,
        model_dir=model_dir,
        summaries_dir=summary_dir,
        data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        mesh_update_routing=args.mesh_update_routing,
        mesh_owner_capacity=args.mesh_owner_capacity,
        mesh_owner_overflow=args.mesh_owner_overflow,
        mesh_row_layout=args.mesh_row_layout,
        mesh_flat_batch=args.mesh_flat_batch,
        resident_data=args.resident_data,
        autosave_every_calls=args.autosave_every_calls,
        write_histograms=args.write_histograms,
        write_tfevents=args.write_tfevents,
        **{k: getattr(args, k) for k in
           ("optimizer", "train_steps_per_call", "compute_dtype",
            "embedding_dtype", "attention_block_size", "length_buckets",
            "resident_round_rows")
           if getattr(args, k) is not None},
        **({"use_pallas_eval_attention": args.use_pallas_eval_attention}
           if args.use_pallas_eval_attention is not None else {}),
        **({"use_pallas_train_attention": args.use_pallas_train_attention}
           if args.use_pallas_train_attention is not None else {}),
        **ds,
    )


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    cfg = make_config(args)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    from clsr_tpu.data.etl import data_preprocessing
    from clsr_tpu.data.graph import build_interaction_graph
    from clsr_tpu.data.loader import SequenceLoader
    from clsr_tpu.data.parser import parse_file
    from clsr_tpu.data.synthetic import write_synthetic_dataset
    from clsr_tpu.data.vocab import load_vocab
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.evaluator import predict_to_file, run_weighted_eval
    from clsr_tpu.training.trainer import Trainer

    from clsr_tpu.data.packed import (PACKED_FILENAME,
                                      build_interaction_graph_packed,
                                      load_packed, make_loader)
    from clsr_tpu.data.parser import time_range_for_unit

    data_dir = os.path.join(args.data_path, args.dataset)
    train_file = os.path.join(data_dir, "train_data")
    valid_file = os.path.join(data_dir, "valid_data")
    test_file = os.path.join(data_dir, "test_data")
    packed_file = os.path.join(data_dir, PACKED_FILENAME)

    if not os.path.exists(train_file) and not os.path.exists(packed_file):
        os.makedirs(data_dir, exist_ok=True)
        if args.dataset == "synthetic":
            write_synthetic_dataset(data_dir, valid_num_ngs=args.val_num_ngs,
                                    test_num_ngs=args.test_num_ngs)
            for src, dst in (("user_vocab.pkl", "user_vocab.pkl"),
                             ("item_vocab.pkl", "item_vocab.pkl"),
                             ("cate_vocab.pkl", "category_vocab.pkl")):
                sp = os.path.join(data_dir, src)
                dp = os.path.join(data_dir, dst)
                if sp != dp and os.path.exists(sp):
                    os.replace(sp, dp)
        elif args.raw_data:
            data_preprocessing(
                args.raw_data, train_file, valid_file, test_file,
                cfg.user_vocab, cfg.item_vocab, cfg.cate_vocab,
                sample_rate=args.sample_rate,
                valid_num_ngs=args.val_num_ngs,
                test_num_ngs=args.test_num_ngs, dataset=args.dataset,
                is_history_expanding=args.is_history_expanding,
                seed=args.seed, processes=args.etl_processes,
                engine="native" if args.etl_native else "python",
                output_format=args.etl_format)
        else:
            raise SystemExit(
                f"{train_file} missing; pass --raw_data to preprocess")

    use_packed = args.data_format == "packed" or (
        args.data_format == "auto" and os.path.exists(packed_file)
        and args.shuffle_history_seed is None)
    if use_packed and not os.path.exists(packed_file):
        raise SystemExit(f"{packed_file} missing; rerun the ETL with "
                         f"--etl_format packed")
    if use_packed and args.shuffle_history_seed is not None:
        raise SystemExit("--shuffle_history_seed needs the TSV path "
                         "(--data_format tsv)")

    uv = load_vocab(cfg.user_vocab)
    iv = load_vocab(cfg.item_vocab)
    cv = load_vocab(cfg.cate_vocab)

    loaders = {}
    if use_packed:
        pack = load_packed(packed_file)
        for name, ngs in (("train", 0), ("valid", cfg.valid_num_ngs),
                          ("test", cfg.test_num_ngs)):
            stored = pack.splits[name].num_ngs
            if ngs and stored != ngs:
                raise SystemExit(
                    f"packed {name} split has {stored} negatives per line "
                    f"but the run asks for {ngs}; regenerate the pack")
            loaders[name] = make_loader(
                pack, name, cfg.max_seq_length,
                time_range_for_unit(cfg.time_unit),
                recent_k=args.counterfactual_recent_k)
    else:
        for name, path in (("train", train_file), ("valid", valid_file),
                           ("test", test_file)):
            ds = parse_file(path, uv, iv, cv, time_unit=cfg.time_unit,
                            recent_k=args.counterfactual_recent_k,
                            shuffle_seed=args.shuffle_history_seed)
            loaders[name] = SequenceLoader(ds, cfg.max_seq_length)

    kwargs = dict(cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
    if cfg.model_type == "lgn":
        kwargs["graph"] = (
            build_interaction_graph_packed(pack, len(uv), len(iv))
            if use_packed else
            build_interaction_graph(train_file, uv, iv, cv))
    model = get_model_class(cfg.model_type)(**kwargs)

    sample = next(loaders["train"].train_batches(
        cfg.batch_size, np.random.RandomState(0)))
    trainer = Trainer(model, cfg, sample)

    if args.only_test:
        trainer.load_latest(cfg.model_dir)
        res = run_weighted_eval(
            trainer.eval_step, trainer.state, loaders["test"], cfg,
            num_ngs=cfg.test_num_ngs,
            calc_mean_alpha=(cfg.model_type in ("clsr", "sli_rec")))
        print(res)
        return 0

    trainer.fit(loaders["train"], loaders["valid"],
                valid_num_ngs=cfg.valid_num_ngs, resume=args.resume)
    if trainer.best_epoch and cfg.model_dir:
        try:
            trainer.load_latest(cfg.model_dir)
        except IOError:
            pass
    res = run_weighted_eval(trainer.eval_step, trainer.state,
                            loaders["test"], cfg, num_ngs=cfg.test_num_ngs)
    print(res)
    if args.write_prediction_to_file:
        predict_to_file(trainer.eval_step, trainer.state, loaders["test"],
                        cfg, os.path.join(args.data_path, "output.txt"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
