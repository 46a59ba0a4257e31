"""Typed experiment configuration.

Replaces the reference's YAML -> flat dict -> tf.contrib HParams pipeline
(reference: reco_utils/recommender/deeprec/deeprec_utils.py:25-534) with a
single frozen dataclass.  Semantics preserved:

  * YAML files are sectioned (data/model/train/info) and flattened
    (deeprec_utils.py:25-39 `flat_config`).
  * Keyword overrides win over YAML values (deeprec_utils.py:514-534
    `prepare_hparams`).
  * Defaults mirror `create_hparams` (deeprec_utils.py:327-510) for every key
    on the sequential-model path.
  * Per-model required-key validation mirrors `check_nn_config`
    (deeprec_utils.py:138-305), with type checking like `check_type`
    (deeprec_utils.py:42-135).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


def _flatten_yaml(loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten a sectioned config: {section: {k: v}} -> {k: v}.

    Mirrors reference `flat_config` (deeprec_utils.py:25-39): section names
    are dropped, keys collide last-wins.
    """
    flat: Dict[str, Any] = {}
    for _, section in (loaded or {}).items():
        if isinstance(section, dict):
            flat.update(section)
    return flat


# Fields that must be int / float / str / list when present, mirroring
# reference `check_type` (deeprec_utils.py:42-135).
_INT_FIELDS = frozenset({
    "epochs", "batch_size", "show_step", "save_epoch", "train_num_ngs",
    "max_seq_length", "hidden_size", "attention_size", "item_embedding_dim",
    "cate_embedding_dim", "user_embedding_dim", "contrastive_length_threshold",
    "contrastive_recent_k", "counterfactual_recent_k", "min_seq_length",
    "early_stop", "kernel_size", "L", "T", "n_v", "n_h",
})
_FLOAT_FIELDS = frozenset({
    "init_value", "learning_rate", "embed_l2", "embed_l1", "layer_l2",
    "layer_l1", "cross_l2", "cross_l1", "attn_loss_weight", "triplet_margin",
    "discrepancy_loss_weight", "contrastive_loss_weight", "manual_alpha_value",
    "embedding_dropout", "max_grad_norm",
})
_STR_FIELDS = frozenset({
    "method", "loss", "optimizer", "init_method", "model_type",
    "sequential_model", "contrastive_loss", "time_unit", "user_vocab",
    "item_vocab", "cate_vocab",
})
_LIST_FIELDS = frozenset({
    "layer_sizes", "att_fcn_layer_sizes", "activation", "dropout",
    "pairwise_metrics", "weighted_metrics", "metrics", "dilations",
    "ncf_layer_sizes",
})

# Required keys per model family, mirroring check_nn_config's per-model sets
# (deeprec_utils.py:138-305; CLSR set at :245-262).
_REQUIRED_BY_MODEL: Dict[str, Tuple[str, ...]] = {
    "clsr": (
        "item_embedding_dim", "cate_embedding_dim", "user_embedding_dim",
        "max_seq_length", "loss", "method", "user_vocab", "item_vocab",
        "cate_vocab", "hidden_size", "att_fcn_layer_sizes",
        "contrastive_length_threshold", "contrastive_recent_k",
    ),
    "sli_rec": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab", "hidden_size",
        "att_fcn_layer_sizes",
    ),
    "gru4rec": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab", "hidden_size",
    ),
    "caser": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab", "L", "T", "n_v",
        "n_h",
    ),
    "asvd": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab",
    ),
    "din": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab",
        "att_fcn_layer_sizes",
    ),
    "dien": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab", "hidden_size",
    ),
    "ncf": (
        "item_embedding_dim", "cate_embedding_dim", "user_embedding_dim",
        "max_seq_length", "loss", "method", "user_vocab", "item_vocab",
        "cate_vocab",
    ),
    "nextitnet": (
        "item_embedding_dim", "cate_embedding_dim", "max_seq_length", "loss",
        "method", "user_vocab", "item_vocab", "cate_vocab", "dilations",
        "kernel_size",
    ),
    "lgn": (
        "item_embedding_dim", "cate_embedding_dim", "user_embedding_dim",
        "max_seq_length", "loss", "method", "user_vocab", "item_vocab",
        "cate_vocab",
    ),
}


@dataclass(frozen=True)
class Config:
    """All hyperparameters for data, model, training and evaluation.

    Defaults mirror the reference's `create_hparams` defaults
    (deeprec_utils.py:327-510) plus the quick-start driver's flag defaults
    (examples/00_quick_start/sequential.py:36-68) where they always override
    (e.g. `train_num_ngs`).
    """

    # --- data -------------------------------------------------------------
    user_vocab: Optional[str] = None
    item_vocab: Optional[str] = None
    cate_vocab: Optional[str] = None
    time_unit: str = "s"               # 's' (taobao) or 'ms' (kuaishou)

    # --- model ------------------------------------------------------------
    model_type: str = "clsr"
    method: str = "classification"
    layer_sizes: Tuple[int, ...] = (100, 64)
    att_fcn_layer_sizes: Tuple[int, ...] = (80, 40)
    activation: Tuple[str, ...] = ("relu", "relu")
    user_dropout: bool = False
    dropout: Tuple[float, ...] = (0.0, 0.0)
    embedding_dropout: float = 0.0
    item_embedding_dim: int = 32
    cate_embedding_dim: int = 8
    user_embedding_dim: int = 40
    hidden_size: int = 40
    attention_size: int = 40
    max_seq_length: int = 50
    min_seq_length: int = 1
    enable_bn: bool = True

    # CLSR-specific (reference clsr.py + sequential.py flags)
    sequential_model: str = "time4lstm"   # 'gru' | 'lstm' | 'time4lstm'
    interest_evolve: bool = True
    predict_long_short: bool = True
    manual_alpha: bool = False
    manual_alpha_value: float = 0.5
    contrastive_loss: str = "triplet"     # 'bpr' | 'triplet'
    triplet_margin: float = 1.0
    contrastive_loss_weight: float = 0.1
    discrepancy_loss_weight: float = 0.01
    contrastive_length_threshold: int = 5
    contrastive_recent_k: int = 3
    attn_loss_weight: float = 0.001
    use_attn_loss: bool = False   # OPT-IN extension: the reference defines
                                  # attn_loss_weight (sequential.py:63,
                                  # deeprec_utils.py:425) but never applies
                                  # it; this adds the paper's supervised
                                  # fusion loss mse(alpha, attn_labels)
    counterfactual_recent_k: int = 5

    # Caser
    L: int = 3
    T: int = 1
    n_v: int = 128
    n_h: int = 128
    # NextItNet
    dilations: Tuple[int, ...] = (1, 2, 4, 1, 2, 4)
    kernel_size: int = 3
    nextitnet_per_position: bool = True  # reference per-position training
                                         # (nextitnet_iterator.py + the
                                         # softmax reshape base_model:218-228)
    # NCF
    ncf_layer_sizes: Tuple[int, ...] = (80, 40)
    # LightGCN-style (lgn)
    n_layers: int = 2

    # --- train ------------------------------------------------------------
    init_method: str = "tnormal"
    init_value: float = 0.01
    embed_l2: float = 1e-6
    embed_l1: float = 0.0
    layer_l2: float = 1e-6
    layer_l1: float = 0.0
    learning_rate: float = 0.001
    loss: str = "softmax"   # softmax | cross_entropy_loss | square_loss | log_loss
    optimizer: str = "adam"
    epochs: int = 100
    batch_size: int = 500
    is_clip_norm: bool = True
    max_grad_norm: float = 2.0
    need_sample: bool = True
    train_num_ngs: int = 4
    valid_num_ngs: int = 4
    test_num_ngs: int = 99
    early_stop: int = 5
    eval_metric: str = "wauc"
    seed: Optional[int] = None

    # --- info / io ---------------------------------------------------------
    show_step: int = 500
    save_model: bool = True
    save_epoch: int = 1
    model_dir: Optional[str] = None
    summaries_dir: Optional[str] = None
    write_tfevents: bool = False
    # mirror of the reference's tf.summary.histogram stream (clsr.py:111,
    # 155,171,217,222,237,266,276; sequential_base_model.py:387-438):
    # device-computed activation/embedding histograms at the show_step
    # cadence (training/steps.py:make_histogram_step)
    write_histograms: bool = False
    metrics: Tuple[str, ...] = ("auc", "logloss")
    pairwise_metrics: Tuple[str, ...] = ("mean_mrr", "ndcg@2;4;6", "hit@2;4;6", "group_auc")
    weighted_metrics: Tuple[str, ...] = ("wauc",)

    # --- TPU-native execution (no reference equivalent) --------------------
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    embedding_dtype: str = "float32"  # 'bfloat16' halves table HBM +
                                      # gather traffic; requires lazyadam
                                      # (f32 moments + f32 update math,
                                      # bf16 round-to-nearest store)
    use_fused_encoders: bool = True   # one-scan CLSR recurrences (ops/fused_clsr.py)
    attention_block_size: int = 0     # >0: blockwise long-context target
                                      # attention (ops/long_context.py)
                                      # for L >= 1000 histories; needs
                                      # enable_bn False (BN-free scorer)
    use_pallas_scan: bool = False     # hand-written recurrence kernel (ops/pallas_scan.py)
    use_pallas_train_attention: str = "off"  # 'auto' | 'on' | 'off' —
                                    # fused two-pass train-mode scorer
                                    # (pallas_attention.py:
                                    # fused_train_attention): batch-BN
                                    # stats via blockwise VMEM kernels,
                                    # custom-VJP rematerialized backward;
                                    # single-device steps only ('auto' =
                                    # on for the TPU backend; default
                                    # off until the measured win ships)
    use_pallas_eval_attention: str = "auto"  # 'auto' | 'on' | 'off' —
                                      # fused eval-mode grouped attention
                                      # scorer kernel
                                      # (ops/pallas_attention.py): 4.4x
                                      # grouped-eval throughput on TPU
                                      # (docs/RESULTS_r2.md).  'auto' =
                                      # on for the TPU backend, off on
                                      # CPU (interpret mode only there);
                                      # single-device eval/serving only
                                      # (mesh eval always uses XLA)
    scan_unroll: int = 1              # lax.scan unroll factor for the
                                      # recurrences (identical math; cuts
                                      # per-iteration loop overhead for
                                      # long histories)
    # fused-encoder scan levers (ops/fused_clsr.py; identical math,
    # measured on TPU in scripts/bench_scan.py — the scan is
    # per-iteration-overhead-bound, scripts/bench_scan_overhead.py):
    scan_concat_inputs: bool = True   # ONE scanned input array per step
                                      # instead of six (fewer dynamic
                                      # slices per iteration)
    scan_remat_body: bool = True      # checkpoint the scan BODY: the
                                      # backward saves carries + input
                                      # slices only (f32 grad -28%,
                                      # bf16 -34% at Kuaishou shapes)
    scan_custom_vjp: bool = False     # hand-shaped scan backward
                                      # (ops/fused_clsr._bd_scan): one
                                      # carry residual/step, weight
                                      # grads hoisted out of the loop
    # K steps per dispatch (steps.py:make_multi_train_step).  Amortizes
    # per-dispatch overhead (~25ms/call under the dev relay's sync mode
    # — utils/device.py); tail batches run single-step, so no examples
    # are dropped at any K.
    train_steps_per_call: int = 32
    autosave_every_calls: int = 0   # > 0: persist full run state (model
                                    # + optimizer + epoch-loop position,
                                    # training/checkpoint.py) to
                                    # <model_dir>/autosave every N train
                                    # dispatches on the resident path;
                                    # Trainer.fit(resume=True) continues
                                    # a killed run bit-for-bit
    data_parallel: int = 1          # mesh axis 'data'
    model_parallel: int = 1         # mesh axis 'model' (row-sharded tables)
    mesh_flat_batch: str = "auto"   # 'auto' | 'on' | 'off' — shard the
                                    # batch over BOTH mesh axes (flat
                                    # data parallelism over d*m devices;
                                    # dense towers stop being replicated
                                    # over 'model', table lookups become
                                    # the DLRM-style id-exchange +
                                    # reduce-scatter, parallel/
                                    # embedding.py).  'auto' = on when
                                    # model_parallel > 1 and the batch
                                    # divides d*m.
    prefetch_batches: int = 2
    resident_data: str = "auto"     # 'auto' | 'on' | 'off' — upload the
                                    # padded train set to HBM once and
                                    # gather batches on device
                                    # (data/resident.py); 'auto' turns on
                                    # when it fits resident_max_bytes
    resident_max_bytes: int = 6_000_000_000
    resident_round_rows: int = 0    # > 1: round the resident dataset's
                                    # (or each length bucket's) row count
                                    # up to this multiple with never-
                                    # eligible zero rows, so program
                                    # shapes — and the 5-10 min TPU relay
                                    # compiles — are shared across
                                    # datasets/seeds (data/resident.py:
                                    # pad_view_rows)
    length_buckets: str = "off"     # 'off' | 'auto' | comma edges ('16')
                                    # — length-aware batching on the
                                    # resident path: rows are partitioned
                                    # by history length into 2-3 buckets,
                                    # each padded to its own Lb and
                                    # trained by its own compiled program
                                    # (scans/attention run Lb, not L,
                                    # iterations — data/resident.py:
                                    # bucket_rows).  'auto' picks edges
                                    # minimizing executed scan iterations
                                    # over the actual length histogram.
                                    # Resident path only; buckets shuffle
                                    # batch ORDER across buckets but each
                                    # batch is single-bucket, so in-batch
                                    # negatives draw from length-
                                    # correlated rows (quality cell:
                                    # docs/RESULTS_r5.md)
    bn_refresh_batches: int = 64    # length-bucketed path only: number
                                    # of bucket-INTERLEAVED single
                                    # batches run forward-only at each
                                    # epoch end to re-estimate the BN
                                    # running statistics before eval.
                                    # The K-step dispatch runs are
                                    # bucket-homogeneous and longer than
                                    # the momentum-0.95 EMA horizon
                                    # (~20 steps), so without this the
                                    # epoch-end running stats reflect
                                    # the LAST bucket, not the mixture
                                    # (docs/RESULTS_r5.md).  0 = off.
    bn_stats_mask: str = "auto"     # 'auto' | 'on' | 'off' — mask-aware
                                    # attention-scorer BN batch stats
                                    # (ops/mlp.py:MaskedBatchNorm):
                                    # statistics over REAL history
                                    # positions only, so they are
                                    # padding-proportion-invariant.
                                    # Required by length_buckets (each
                                    # bucket pads differently); 'auto' =
                                    # on exactly when length_buckets is.
                                    # Off = reference-faithful BN (stats
                                    # include padded positions at the
                                    # constant L)
    drop_remainder_min: int = 5     # reference drops train batches <5 rows
                                    # (sequential_iterator.py:338-339)
    compact_rows: str = "auto"      # 'auto' | 'off' — compact row engine
                                    # (training/compact_rows.py): one
                                    # sorted gather + sorted-unique row
                                    # writes per table per step; lazyadam
                                    # single-device only, falls back
                                    # automatically elsewhere
    mesh_update_routing: str = "broadcast"  # 'broadcast' | 'owner' — how
                                    # the mesh-compact gradient merge
                                    # reaches the owning model shards.
                                    # 'broadcast': all_gather the full
                                    # (id, grad) stream, every device
                                    # replays the merge (O(M) bytes,
                                    # exact).  'owner': static-bucketed
                                    # all_to_all routes (uid, gsum) to
                                    # the owning shard — O(M/m) bytes
                                    # per device (docs/SCALING.md);
                                    # per-owner bucket capacity below
                                    # must hold (overflow is counted in
                                    # LazyAdamState.route_overflow and
                                    # warned about; the step falls back
                                    # to the broadcast merge — see
                                    # mesh_owner_overflow)
    mesh_owner_capacity: float = 4.0  # per-owner bucket slots =
                                    # ceil(f * Mi / m) clamped to
                                    # [1, Mi]; raise for skewed
                                    # (frequency-ordered) id spaces
    mesh_owner_overflow: str = "fallback"  # 'fallback' | 'drop' — what
                                    # an over-capacity owner bucket does.
                                    # 'fallback': the WHOLE table update
                                    # takes the exact broadcast merge
                                    # that step (lax.cond; the psum'd
                                    # overflow flag is uniform across
                                    # devices, so branch selection is
                                    # collective-safe) — lossless at any
                                    # capacity, overflow counter becomes
                                    # pure telemetry.  'drop': round-3
                                    # semantics (overflowed entries'
                                    # gradients are dropped that step) —
                                    # keeps the compiled program free of
                                    # any full-stream collective
    mesh_row_layout: str = "auto"   # 'auto' | 'interleaved' |
                                    # 'contiguous' — physical row layout
                                    # of model-sharded tables.
                                    # 'interleaved': logical row i lives
                                    # on shard i % m at local row i // m
                                    # (one host-side transpose at
                                    # placement), so frequency-ordered
                                    # vocabs spread hot rows across ALL
                                    # shards — the skew-proof owner
                                    # function for the owner-routed
                                    # merge.  'contiguous': shard j owns
                                    # rows [j*N/m, (j+1)*N/m).  'auto':
                                    # interleaved iff
                                    # mesh_update_routing == 'owner'
                                    # (the one path whose wire bytes
                                    # depend on owner balance)

    # ------------------------------------------------------------------ api
    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    @property
    def target_dim(self) -> int:
        """Dim of target_item_embedding = concat(item, cate) per
        sequential_base_model.py:435-437."""
        return self.item_embedding_dim + self.cate_embedding_dim

    def validate(self) -> "Config":
        """Fail fast on missing/mistyped fields, like check_nn_config."""
        model = self.model_type.lower()
        required = _REQUIRED_BY_MODEL.get(model, _REQUIRED_BY_MODEL["gru4rec"])
        flat = dataclasses.asdict(self)
        for key in required:
            if flat.get(key) is None:
                raise ValueError(
                    f"Parameter {key} must be set for model {model}"
                )
        for key, val in flat.items():
            if val is None:
                continue
            if key in _INT_FIELDS and not isinstance(val, int):
                raise TypeError(f"Parameter {key} must be int, got {type(val)}")
            if key in _FLOAT_FIELDS and not isinstance(val, (int, float)):
                raise TypeError(f"Parameter {key} must be float, got {type(val)}")
            if key in _STR_FIELDS and not isinstance(val, str):
                raise TypeError(f"Parameter {key} must be str, got {type(val)}")
            if key in _LIST_FIELDS and not isinstance(val, (list, tuple)):
                raise TypeError(f"Parameter {key} must be a sequence, got {type(val)}")
        if self.method not in ("classification", "regression"):
            raise ValueError(f"method must be classification or regression, got {self.method}")
        if self.loss not in ("softmax", "cross_entropy_loss", "square_loss", "log_loss"):
            raise ValueError(f"loss not defined: {self.loss}")
        if self.contrastive_loss not in ("bpr", "triplet"):
            raise ValueError(f"contrastive_loss must be bpr or triplet, got {self.contrastive_loss}")
        if self.sequential_model not in ("gru", "lstm", "time4lstm"):
            raise ValueError(f"sequential_model not defined: {self.sequential_model}")
        if self.attention_block_size > 0 and self.enable_bn:
            raise ValueError(
                "attention_block_size requires enable_bn: False (the "
                "blockwise scorer is BN-free, ops/long_context.py)")
        if self.embedding_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"embedding_dtype must be float32 or bfloat16, got "
                f"{self.embedding_dtype}")
        if (self.embedding_dtype == "bfloat16"
                and self.optimizer != "lazyadam"):
            # the dense optimizers flatten all params into one vector
            # (mixed dtypes) and keep no f32 update path for bf16 params
            raise ValueError(
                "embedding_dtype=bfloat16 requires optimizer=lazyadam")
        if self.mesh_flat_batch not in ("auto", "on", "off"):
            raise ValueError(
                f"mesh_flat_batch must be auto/on/off, "
                f"got {self.mesh_flat_batch}")
        n_dev = self.data_parallel * self.model_parallel
        if (self.mesh_flat_batch == "on" and self.batch_size % n_dev):
            raise ValueError(
                f"mesh_flat_batch='on' needs batch_size divisible by "
                f"data_parallel*model_parallel ({self.batch_size} % "
                f"{n_dev} != 0)")
        if self.compact_rows not in ("auto", "off"):
            raise ValueError(
                f"compact_rows must be auto/off, got {self.compact_rows}")
        if self.mesh_update_routing not in ("broadcast", "owner"):
            raise ValueError(
                f"mesh_update_routing must be broadcast/owner, got "
                f"{self.mesh_update_routing}")
        if self.mesh_owner_capacity <= 0:
            raise ValueError(
                f"mesh_owner_capacity must be > 0, got "
                f"{self.mesh_owner_capacity}")
        if self.autosave_every_calls < 0:
            raise ValueError(
                f"autosave_every_calls must be >= 0, got "
                f"{self.autosave_every_calls}")
        if self.autosave_every_calls > 0 and not self.model_dir:
            raise ValueError(
                "autosave_every_calls > 0 requires model_dir")
        if self.mesh_owner_overflow not in ("fallback", "drop"):
            raise ValueError(
                f"mesh_owner_overflow must be fallback/drop, got "
                f"{self.mesh_owner_overflow}")
        if self.mesh_row_layout not in ("auto", "interleaved",
                                        "contiguous"):
            raise ValueError(
                f"mesh_row_layout must be auto/interleaved/contiguous, "
                f"got {self.mesh_row_layout}")
        if self.resident_data not in ("auto", "on", "off"):
            raise ValueError(
                f"resident_data must be auto/on/off, got {self.resident_data}")
        if self.length_buckets not in ("off", "auto"):
            try:
                edges = [int(e) for e in self.length_buckets.split(",")]
            except ValueError:
                raise ValueError(
                    f"length_buckets must be off/auto or comma-separated "
                    f"ints, got {self.length_buckets!r}")
            if (sorted(edges) != edges or len(set(edges)) != len(edges)
                    or any(e < 1 or e >= self.max_seq_length
                           for e in edges)):
                raise ValueError(
                    f"length_buckets edges must be strictly ascending and "
                    f"in [1, max_seq_length), got {self.length_buckets!r}")
        if self.bn_stats_mask not in ("auto", "on", "off"):
            raise ValueError(
                f"bn_stats_mask must be auto/on/off, got "
                f"{self.bn_stats_mask}")
        if self.length_buckets != "off" and self.autosave_every_calls > 0:
            raise ValueError(
                "autosave_every_calls (mid-epoch resume) is not supported "
                "with length_buckets — the run state stores a single "
                "epoch permutation")
        if self.use_pallas_eval_attention not in ("auto", "on", "off"):
            raise ValueError(
                f"use_pallas_eval_attention must be auto/on/off, got "
                f"{self.use_pallas_eval_attention}")
        if self.use_pallas_train_attention not in ("auto", "on", "off"):
            raise ValueError(
                f"use_pallas_train_attention must be auto/on/off, got "
                f"{self.use_pallas_train_attention}")
        if (self.data_parallel > 1
                and self.batch_size % self.data_parallel != 0):
            raise ValueError(
                f"batch_size {self.batch_size} must divide evenly over "
                f"data_parallel={self.data_parallel}")
        if model == "lgn" and self.optimizer == "lazyadam":
            # LGN's graph convolution produces DENSE table gradients;
            # lazy row updates would silently drop most of them
            raise ValueError("lazyadam is not valid for lgn (dense table "
                             "gradients from the graph convolution)")
        if model == "clsr" and self.hidden_size != self.target_dim:
            # the alpha fusion adds att_fea_long (history dim = item+cate)
            # to att_fea_short (RNN hidden dim) — clsr.py:265; the taobao
            # config satisfies 32+8 == 40 (clsr.yaml:18-19,41)
            raise ValueError(
                "CLSR requires hidden_size == item_embedding_dim + "
                f"cate_embedding_dim (got {self.hidden_size} vs "
                f"{self.target_dim})")
        return self


# YAML keys (reference spelling) -> Config field names.
_KEY_ALIASES = {
    "EARLY_STOP": "early_stop",
    "MODEL_DIR": "model_dir",
    "SUMMARIES_DIR": "summaries_dir",
    "enable_BN": "enable_bn",
}

_SEQ_FIELDS = {
    f.name for f in dataclasses.fields(Config)
    if f.name in _LIST_FIELDS or f.name in ("dilations",)
}


def _coerce(key: str, value: Any) -> Any:
    if key in _SEQ_FIELDS and isinstance(value, list):
        return tuple(value)
    if key == "is_clip_norm":
        return bool(value)
    return value


def load_config(yaml_file: Optional[str] = None, **overrides) -> Config:
    """Build a validated Config from an optional YAML file plus overrides.

    Mirrors reference `prepare_hparams` (deeprec_utils.py:514-534): YAML
    values first, keyword overrides win, then validation.
    """
    flat: Dict[str, Any] = {}
    if yaml_file is not None:
        with open(yaml_file, "r") as f:
            loaded = yaml.safe_load(f)
        flat.update(_flatten_yaml(loaded))
    flat.update(overrides)

    known = {f.name for f in dataclasses.fields(Config)}
    kwargs: Dict[str, Any] = {}
    for key, value in flat.items():
        name = _KEY_ALIASES.get(key, key)
        if name in known:
            kwargs[name] = _coerce(name, value)
        # Unknown keys are ignored, like HParams construction which only
        # reads whitelisted keys (deeprec_utils.py:327-510).
    return Config(**kwargs).validate()
