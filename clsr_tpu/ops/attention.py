"""Attention primitives.

`TargetAttention` reimplements `_attention_fcn` (clsr.py:343-381, shared by
SLI-Rec/DIN/DIEN): keys are projected to the query's width, the interaction
features [k, q, k-q, k*q] feed an MLP scorer, padded positions are masked
with -(2^32)+1 before softmax, and the weighted sum over keys is returned.

Grouped-target extension (TPU-native): the query may be [B, G, Dq] — one
history scored against G candidate targets in a single pass.  The key
projection (the only [B, L] matmul) is query-independent and computed once;
only the tiny scorer MLP fans out over G.

`SoftAttention` reimplements `_attention` (base_model.py:595-625): a learned
global query vector, softmax over ALL positions (the reference applies no
mask here — quirk preserved), returns the weighted sequence.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clsr_tpu.ops.mlp import FcnNet

MASK_PADDING_VALUE = -(2.0 ** 32) + 1  # clsr.py:375


class TargetAttention(nn.Module):
    """Query-conditioned attention over a masked history."""

    layer_sizes: Sequence[int]
    activations: Sequence[str]
    enable_bn: bool = False
    kernel_init: nn.initializers.Initializer = nn.initializers.truncated_normal(stddev=0.01)
    dtype: "jnp.dtype | None" = None   # compute dtype of the scorer MLP
    # mask-aware BN batch statistics (ops/mlp.py:MaskedBatchNorm) — the
    # padding-proportion-invariant stats length-aware batching requires;
    # set from cfg.bn_stats_mask by the models
    bn_stats_mask: bool = False

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False,
                 return_weights: bool = False):
        """query [B, Dq] or [B, G, Dq]; keys [B, L, Dk]; mask [B, L].

        Returns att_fea [B, Dk] or [B, G, Dk] (+ weights if requested).
        """
        squeeze_group = query.ndim == 2
        if squeeze_group:
            query = query[:, None, :]
        B, G, Dq = query.shape
        _, L, Dk = keys.shape

        W = self.param("attention_mat", self.kernel_init, (Dk, Dq))
        ct = self.dtype or keys.dtype
        att_inputs = jnp.einsum("bld,dq->blq", keys.astype(ct),
                                W.astype(ct))                   # [B, L, Dq]

        # fused Pallas eval scorer (ops/pallas_attention.py): at the
        # grouped-eval shape the two scorer matmuls + masked softmax +
        # weighted sum run block-by-block in VMEM instead of streaming
        # [B, L, G, 80/40] hidden activations through HBM.  Trace-time
        # gate set by the eval builders; mesh traces additionally set
        # the eval-mesh context and route through shard_map below.
        from clsr_tpu.ops import pallas_attention as pa
        if (pa.eval_attention_enabled() and not train and not return_weights
                and not self.is_initializing()
                and G >= 8 and len(self.layer_sizes) == 2
                and all(self.activations[min(i, len(self.activations) - 1)]
                        == "relu" for i in range(2))):
            from clsr_tpu.parallel.embedding import batch_axes
            # mesh eval traces (parallel/mesh.py:make_sharded_eval_step)
            # always set this — including data-parallel-only meshes
            # where the table context is None but the batch is sharded
            mesh_info = pa.active_eval_mesh()
            mesh, flat = mesh_info if mesh_info else (None, False)
            n_shards = (1 if mesh is None else
                        int(np.prod([mesh.shape[a]
                                     for a in batch_axes(flat)])))
            if B % n_shards == 0:
                fcn_params = self.variables["params"]["att_fcn"]
                fcn_stats = (self.variables["batch_stats"].get("att_fcn", {})
                             if self.enable_bn else {})
                folded = pa.fold_scorer_params(fcn_params, fcn_stats, Dq,
                                               self.enable_bn)
                ctd = ("bfloat16" if self.dtype == jnp.bfloat16 else None)
                args = (keys.astype(jnp.float32),
                        att_inputs.astype(jnp.float32),
                        query.astype(jnp.float32),
                        mask.astype(jnp.float32)) + folded
                if mesh is None:
                    att_fea = pa.fused_eval_attention(
                        *args, compute_dtype=ctd)
                else:
                    # sharded eval / multi-chip serving: kernel per
                    # batch shard under shard_map (no GSPMD rule needed)
                    att_fea = pa.fused_eval_attention_mesh(
                        mesh, flat, *args, compute_dtype=ctd)
                return att_fea[:, 0] if squeeze_group else att_fea

        # fused TRAIN scorer (ops/pallas_attention.py:
        # fused_train_attention, VERDICT r3 item 2b): two-pass batch-BN
        # fold + the eval kernel, custom VJP = exact rematerialized
        # train-BN gradient — the [B, L, G, 80/40] scorer hiddens never
        # reach the forward's HBM residuals.  On a mesh the scorer goes
        # through the shard_map island (fused_train_attention_mesh) with
        # GLOBAL batch-BN collectives; the BN running-stat updates go
        # through FcnNet's manual_bn_stats branch under the identical
        # variable paths.
        if (pa.train_attention_enabled() and train and not return_weights
                and not self.is_initializing()
                and not (self.bn_stats_mask and self.enable_bn)
                and pa.active_eval_mesh() is None
                and len(self.layer_sizes) == 2
                and all(self.activations[min(i, len(self.activations) - 1)]
                        == "relu" for i in range(2))):
            fcn_params = self.variables["params"]["att_fcn"]
            k0 = fcn_params["w_nn_layer0"]["kernel"]
            b0 = fcn_params["w_nn_layer0"]["bias"]
            w1 = fcn_params["w_nn_layer1"]["kernel"]
            b1 = fcn_params["w_nn_layer1"]["bias"]
            w2 = fcn_params["w_nn_output"]["kernel"][:, 0]
            if self.enable_bn:
                s0 = fcn_params["bn0"]["scale"]
                sh0 = fcn_params["bn0"]["bias"]
                s1 = fcn_params["bn1"]["scale"]
                sh1 = fcn_params["bn1"]["bias"]
            else:
                H0, H1 = w1.shape[0], w1.shape[1]
                s0 = sh0 = jnp.ones((H0,), jnp.float32)
                s1 = sh1 = jnp.ones((H1,), jnp.float32)
            ctd = "bfloat16" if self.dtype == jnp.bfloat16 else None
            targs = (keys.astype(jnp.float32),
                     att_inputs.astype(jnp.float32),
                     query.astype(jnp.float32), mask.astype(jnp.float32),
                     k0, b0, s0, sh0, w1, b1, s1, sh1, w2)
            tmesh = pa.active_train_mesh()
            if tmesh is None:
                att_fea, m0, v0, m1, v1 = pa.fused_train_attention(
                    *targs, 128, ctd, None, self.enable_bn)
            else:
                att_fea, m0, v0, m1, v1 = pa.fused_train_attention_mesh(
                    tmesh[0], tmesh[1], *targs, compute_dtype=ctd,
                    enable_bn=self.enable_bn)
            if self.enable_bn:
                # running-average updates under the same att_fcn/bn*
                # paths the XLA trace writes (ops/mlp.py)
                FcnNet(self.layer_sizes, self.activations,
                       enable_bn=self.enable_bn,
                       kernel_init=self.kernel_init, dtype=self.dtype,
                       name="att_fcn")(
                    None, train=True,
                    manual_bn_stats=[(m0, v0), (m1, v1)])
            return att_fea[:, 0] if squeeze_group else att_fea

        # scorer over the implicit concat [k, q, k-q, k*q]: the first
        # layer is algebraically split (ops/mlp.py:SplitFirstDense) so the
        # reference's [B, G, L, 4Dq] interaction tensor (clsr.py:355-368)
        # never exists in HBM.  Internal layout is [B, L, G, .] (the
        # natural dot_general layout — no transposes); the softmax runs
        # over axis 1.
        logits = FcnNet(self.layer_sizes, self.activations,
                        enable_bn=self.enable_bn, out_dim=1,
                        kernel_init=self.kernel_init, dtype=self.dtype,
                        name="att_fcn")(
            None, train=train,
            split_parts=(att_inputs, query.astype(ct)),
            stats_weight=(mask[:, :, None, None]
                          if (self.bn_stats_mask and self.enable_bn)
                          else None))[..., 0]                    # [B,L,G]
        logits = logits.astype(jnp.float32)   # stable masked softmax

        masked = jnp.where(mask[:, :, None] > 0, logits, MASK_PADDING_VALUE)
        w = jax.nn.softmax(masked, axis=1)                      # [B,L,G]
        att_fea = jnp.einsum("blg,bld->bgd", w, keys)           # [B,G,Dk]

        if squeeze_group:
            att_fea = att_fea[:, 0]
        if not return_weights:
            return att_fea
        weights = jnp.swapaxes(w, 1, 2)                         # [B,G,L]
        if squeeze_group:
            weights = weights[:, 0]
        return att_fea, weights


class SoftAttention(nn.Module):
    """Global-query soft attention (A2SVD path, base_model.py:595-625)."""

    attention_size: int
    kernel_init: nn.initializers.Initializer = nn.initializers.truncated_normal(stddev=0.01)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs [B, L, D] -> weighted sequence [B, L, D]."""
        D = inputs.shape[-1]
        W = self.param("attention_mat", self.kernel_init, (D, D))
        q = self.param("query", self.kernel_init, (self.attention_size,))
        att_inputs = jnp.einsum("bld,dh->blh", inputs, W)
        logits = jnp.einsum("blh,h->bl", att_inputs, q)
        weights = jax.nn.softmax(logits, axis=-1)  # no mask — reference quirk
        return inputs * weights[..., None]
