"""Roofline / MFU accounting for the train and eval programs
(VERDICT r3 item 2a / missing #3).

Pulls XLA `compiled.cost_analysis()` FLOPs and bytes for the SAME
programs the benchmarks time (bench.py Taobao dims, bench_kuaishou.py
Kuaishou dims; single train step + grouped eval step), and reports
achieved FLOP/s and bytes/s against stated chip peaks next to the
measured honest step times.  This is the absolute-performance number
BENCH's `vs_baseline` multiplier never showed: a 40-dim recommender is
LANE-PADDING- and MEMORY-bound, not MXU-bound — the table quantifies
how much of the remaining gap is intrinsic (128-lane padding of D=40
operands, L sequential scan steps) vs claimable (HBM traffic of the
scorer intermediates, which the fused train kernel removes:
--train_kernel on/off diffs the program's bytes).

Peaks default to v5e-class numbers (overridable): --peak_tflops_bf16
197, --peak_tflops_f32 49 (MXU f32 ~= bf16/4), --peak_hbm_gbps 819.

Usage (TPU; compile cache makes cached programs cheap):
  python scripts/roofline.py --configs taobao,kuaishou \
      --step_ms taobao=5.61,kuaishou=15.0 [--train_kernel on]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    # bench.py / scripts/bench_kuaishou.py dims
    "taobao": dict(n_items=100_000, n_cates=5_000, n_users=8_000,
                   L=50, B=512, test_G=50),
    "kuaishou": dict(n_items=500_000, n_cates=2_000, n_users=100_000,
                     L=250, B=256, test_G=50),
}


def build_programs(name, sc, train_kernel: str, dtype: str):
    import jax

    from __graft_entry__ import _taobao_cfg, _tiny_batch
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_eval_step, make_train_step

    kw = dict(batch_size=sc["B"], optimizer="lazyadam",
              max_seq_length=sc["L"],
              use_pallas_train_attention=train_kernel)
    if dtype == "bfloat16":
        kw.update(compute_dtype="bfloat16", embedding_dtype="bfloat16")
    cfg = _taobao_cfg(**kw)
    model = get_model_class("clsr")(
        cfg=cfg, n_users=sc["n_users"], n_items=sc["n_items"],
        n_cates=sc["n_cates"])
    batch = _tiny_batch(B=sc["B"], L=sc["L"], n_items=sc["n_items"],
                        n_cates=sc["n_cates"])
    state = jax.eval_shape(
        lambda: create_train_state(model, cfg, batch,
                                   rng=jax.random.PRNGKey(0)))
    sds = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                       np.asarray(x).dtype), t)
    train = make_train_step(model, cfg, donate=False).lower(
        state, sds(batch), jax.ShapeDtypeStruct((2,), np.uint32)
    ).compile()
    ebatch = _tiny_batch(B=sc["B"], L=sc["L"], n_items=sc["n_items"],
                         n_cates=sc["n_cates"], G=sc["test_G"])
    evalc = make_eval_step(model, cfg).lower(state, sds(ebatch)).compile()
    return train, evalc


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed",
                                                     0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="taobao,kuaishou")
    ap.add_argument("--step_ms", default="taobao=5.61,kuaishou=15.0",
                    help="measured honest step times per config "
                         "(docs/RESULTS_r3.md protocol)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--train_kernel", default="off",
                    choices=["on", "off"])
    ap.add_argument("--peak_tflops_bf16", type=float, default=197.0)
    ap.add_argument("--peak_tflops_f32", type=float, default=49.0)
    ap.add_argument("--peak_hbm_gbps", type=float, default=819.0)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/clsr_tpu_xla"))

    step_ms = dict(kv.split("=") for kv in args.step_ms.split(","))
    peak_flops = (args.peak_tflops_bf16 if args.dtype == "bfloat16"
                  else args.peak_tflops_f32) * 1e12
    peak_bw = args.peak_hbm_gbps * 1e9
    sep = "|" if args.md else "  "
    hdr = ["program", "GFLOP", "GB moved", "ms", "TFLOP/s", "%MXU peak",
           "GB/s", "%HBM peak", "bound"]
    print(sep.join(hdr))
    if args.md:
        print("|".join(["---"] * len(hdr)))
    for name in args.configs.split(","):
        sc = CONFIGS[name]
        train, evalc = build_programs(name, sc, args.train_kernel,
                                      args.dtype)
        for prog, compiled, ms in (
                ("train " + name, train, float(step_ms.get(name, 0))),
                ("eval  " + name, evalc, 0.0)):
            fl, by = cost(compiled)
            row = [f"{prog} (B={sc['B']},L={sc['L']},"
                   f"k={args.train_kernel})",
                   f"{fl / 1e9:.2f}", f"{by / 1e9:.2f}"]
            if ms > 0:
                t = ms / 1e3
                af, ab = fl / t, by / t
                bound = ("HBM" if ab / peak_bw > af / peak_flops
                         else "MXU")
                row += [f"{ms:.2f}", f"{af / 1e12:.2f}",
                        f"{af / peak_flops * 100:.1f}%",
                        f"{ab / 1e9:.0f}",
                        f"{ab / peak_bw * 100:.1f}%", bound]
            else:
                row += ["-"] * 6
            print(sep.join(row), flush=True)
            rec = dict(program=prog, flops=fl, bytes=by, ms=ms,
                       dtype=args.dtype, train_kernel=args.train_kernel)
            with open("/tmp/roofline.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
