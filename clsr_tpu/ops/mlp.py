"""MLP head and activations.

`FcnNet` mirrors the reference `_fcn_net` (base_model.py:627-708): a stack
of Dense layers with optional BatchNorm (momentum 0.95, epsilon 1e-4 —
base_model.py:673-679) and per-layer activation, followed by a final
Dense(out_dim) projection with no BN/activation ("w_nn_output").  With
`out_dim=None` it matches `_fcn_transform_net` (clsr.py:279-341, no final
projection).

`Dice` is the data-adaptive activation (deeprec_utils.py:838-860): always
normalizes with the *current batch's* statistics (the reference implements
only the train-mode branch), std = sqrt(mean((x-mean)^2 + eps)), normed =
(x-mean)/(std+eps).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Dice(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        eps = 1e-9
        alphas = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        std = jnp.sqrt(jnp.mean(jnp.square(x - mean) + eps, axis=axes,
                                keepdims=True))
        x_normed = (x - mean) / (std + eps)
        x_p = jax.nn.sigmoid(x_normed)
        return alphas * (1.0 - x_p) * x + x_p * x


class SplitFirstDense(nn.Module):
    """First scorer layer of target attention WITHOUT materializing the
    [B, G, L, 4D] interaction tensor.

    The reference scorer concatenates [k, q, k-q, k*q] and applies one
    Dense (clsr.py:355-368).  Concat-then-matmul equals the sum of
    block matmuls, so with kernel blocks [Wk; Wq; Wd; Wm]:

        out = k@(Wk+Wd) + q@(Wq-Wd) + (k*q)@Wm + bias

    where k@(Wk+Wd) is [B, L, H] (target-independent, computed once),
    q@(Wq-Wd) is [B, G, H] (position-independent), and the product term
    contracts D per row as one [L, D] x [D, G*H] matmul — no [B, G, L, *]
    tensor exists before the H-wide layer output that BN/relu need
    anyway.  Exact same math and parameter tree (kernel [4D, H], bias
    [H]) as the Dense it replaces; ~4x fewer first-layer FLOPs and ~6x
    less HBM traffic at the reference dims.
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.truncated_normal(stddev=0.01)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, keys_proj: jnp.ndarray, query: jnp.ndarray
                 ) -> jnp.ndarray:
        """keys_proj [B, L, D], query [B, G, D] -> [B, L, G, features].

        NOTE the [B, L, G, .] output layout: it is the natural (no
        transpose) layout of the product-term dot_general, and the
        downstream softmax/weighted-sum work over axis 1 just as well.
        """
        D = keys_proj.shape[-1]
        H = self.features
        kernel = self.param("kernel", self.kernel_init, (4 * D, H))
        bias = self.param("bias", nn.initializers.zeros, (H,))
        ct = self.dtype or keys_proj.dtype
        k = keys_proj.astype(ct)
        q = query.astype(ct)
        kr = kernel.astype(ct)
        wk, wq, wd, wm = kr[:D], kr[D:2 * D], kr[2 * D:3 * D], kr[3 * D:]
        term_k = jnp.einsum("bld,dh->blh", k, wk + wd)      # [B, L, H]
        term_q = jnp.einsum("bgd,dh->bgh", q, wq - wd)      # [B, G, H]
        qw = jnp.einsum("bgd,dh->bdgh", q, wm)              # [B, D, G, H]
        B, G = query.shape[:2]
        L = keys_proj.shape[1]
        term_m = jax.lax.dot_general(                       # [B, L, G*H]
            k, qw.reshape(B, D, G * H),
            (((2,), (1,)), ((0,), (0,)))).reshape(B, L, G, H)
        return (term_m + term_k[:, :, None, :] + term_q[:, None, :, :]
                + bias.astype(ct))


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics cover REAL (weighted) positions
    only.

    Length-aware batching (data/resident.py:bucket_rows) gives every
    compiled bucket program a different padding proportion, while
    nn.BatchNorm's batch statistics average over ALL positions —
    including padded ones, whose activations are the query-broadcast
    terms, not zeros.  Per-bucket programs then train against
    bucket-specific normalizations while eval applies one mixed running
    affine — measured -14pt GAUC on the bimodal cell
    (docs/RESULTS_r5.md).  Weighting the statistics by the position
    mask makes them padding-proportion-INVARIANT: every bucket (and the
    full-L eval batch) sees the same distribution.  This deviates from
    the reference's tf BN, which averages the padded positions too at a
    CONSTANT L (clsr.py:355-368 scorer under base_model.py:673-679 BN);
    active only under cfg.bn_stats_mask (default 'auto' = on exactly
    when length_buckets is).

    The variable tree (params scale/bias, batch_stats mean/var — names,
    shapes, inits) is identical to nn.BatchNorm, so checkpoints are
    interchangeable between the two."""

    momentum: float = 0.95
    epsilon: float = 1e-4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, weight: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (C,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (C,))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if train and not self.is_initializing():
            wb = jnp.broadcast_to(weight.astype(jnp.float32),
                                  xf.shape[:-1] + (1,))
            den = jnp.maximum(jnp.sum(wb, axis=axes), 1.0)
            mean = jnp.sum(xf * wb, axis=axes) / den
            var = jnp.sum(wb * jnp.square(xf - mean), axis=axes) / den
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class _BNStatsUpdate(nn.Module):
    """Stand-in for nn.BatchNorm when the normalization itself was
    computed by the fused train scorer (ops/pallas_attention.py
    fused_train_attention): declares the IDENTICAL variable tree
    (params scale/bias, batch_stats mean/var — same names, shapes,
    inits as flax BatchNorm) and applies the same running-average
    update from the kernel-computed batch statistics.  Because flax
    records no module types in the variable tree, traces using this
    module and traces using nn.BatchNorm are checkpoint-compatible."""

    momentum: float = 0.95

    @nn.compact
    def __call__(self, batch_mean: jnp.ndarray, batch_var: jnp.ndarray):
        H = batch_mean.shape[-1]
        self.param("scale", nn.initializers.ones, (H,))
        self.param("bias", nn.initializers.zeros, (H,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (H,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (H,))
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1 - m) * batch_var


class FcnNet(nn.Module):
    """Dense stack with optional BN, per base_model.py:627-708.

    `dtype` (e.g. jnp.bfloat16) selects the COMPUTE dtype of the dense
    layers — params stay float32 (flax param_dtype default), BN statistics
    run in float32, and the final output is cast back to float32.

    When called with `split_parts=(keys_proj, query)`, layer 0 is a
    `SplitFirstDense` over the implicit concat [k, q, k-q, k*q] (same
    parameter tree as the plain Dense); `x` is then ignored.
    """

    layer_sizes: Sequence[int]
    activations: Sequence[str]
    enable_bn: bool = False
    out_dim: Optional[int] = 1
    kernel_init: nn.initializers.Initializer = nn.initializers.truncated_normal(stddev=0.01)
    dropout_rates: Optional[Sequence[float]] = None  # hparams.dropout when user_dropout
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], train: bool = False,
                 split_parts=None, manual_bn_stats=None,
                 stats_weight=None) -> jnp.ndarray:
        if manual_bn_stats is not None:
            # the fused train scorer (ops/pallas_attention.py) computed
            # the forward and the batch statistics itself; this call
            # only applies the BN running-average updates under the
            # exact same variable paths (bn0/bn1) the normal trace uses
            for idx, (m, v) in enumerate(manual_bn_stats):
                _BNStatsUpdate(momentum=0.95, name=f"bn{idx}")(m, v)
            return None
        if x is not None and self.dtype is not None:
            x = x.astype(self.dtype)
        for idx, size in enumerate(self.layer_sizes):
            if idx == 0 and split_parts is not None:
                x = SplitFirstDense(size, kernel_init=self.kernel_init,
                                    dtype=self.dtype,
                                    name="w_nn_layer0")(*split_parts)
            else:
                x = nn.Dense(size, kernel_init=self.kernel_init,
                             bias_init=nn.initializers.zeros, dtype=self.dtype,
                             name=f"w_nn_layer{idx}")(x)
            if self.enable_bn:
                if stats_weight is not None:
                    # padding-invariant batch statistics (length-aware
                    # batching; see MaskedBatchNorm) — same variable tree
                    x = MaskedBatchNorm(momentum=0.95, epsilon=1e-4,
                                        dtype=self.dtype,
                                        name=f"bn{idx}")(x, stats_weight,
                                                         train)
                else:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.95, epsilon=1e-4,
                                     dtype=self.dtype,
                                     name=f"bn{idx}")(x)
            if self.dropout_rates is not None:
                rate = self.dropout_rates[min(idx, len(self.dropout_rates) - 1)]
                x = nn.Dropout(rate=rate, deterministic=not train)(x)
            x = activate(x, self.activations[min(idx, len(self.activations) - 1)],
                         parent=self, layer_idx=idx)
        if self.out_dim is not None:
            x = nn.Dense(self.out_dim, kernel_init=self.kernel_init,
                         bias_init=nn.initializers.zeros, dtype=self.dtype,
                         name="w_nn_output")(x)
        return x.astype(jnp.float32) if self.dtype is not None else x


def activate(x: jnp.ndarray, activation: str, parent: Optional[nn.Module] = None,
             layer_idx: int = 0) -> jnp.ndarray:
    """Activation dispatch, mirroring base_model.py:314-330."""
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "tanh":
        return jnp.tanh(x)
    if activation == "elu":
        return jax.nn.elu(x)
    if activation == "identity":
        return x
    if activation == "dice":
        if parent is None:
            raise ValueError("dice needs a parent module for its parameters")
        return Dice(name=f"dice_{layer_idx}", parent=parent)(x)
    raise ValueError(f"this activations not defined {activation}")
