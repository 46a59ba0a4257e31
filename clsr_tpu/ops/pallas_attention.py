"""Pallas TPU kernel: fused grouped-attention scorer for eval/serving.

Reimplements the EVAL-mode forward of `TargetAttention` (which itself
reimplements the reference `_attention_fcn`, clsr.py:343-381, with the
`_fcn_net` scorer MLP of base_model.py:627-708) as ONE fused kernel.

Why a kernel wins exactly here and nowhere else in this framework
(docs/RESULTS_r2.md "Split-first-layer"): at the grouped-eval shape
(1 positive + 99 negatives per impression, G=100) the scorer MLP's
hidden activations are [B, L, G, 80] + [B, L, G, 40] — hundreds of MB
that XLA must round-trip through HBM between the layer matmuls (it
cannot fuse matmul->matmul chains).  In EVAL mode the BatchNorm between
layers uses running statistics, i.e. it is a per-channel affine — so
the whole chain

    x0 = k@(Wk+Wd) + q@(Wq-Wd) + (k*q)@Wm          (SplitFirstDense)
    y0 = relu(a0*x0 + c0)                           (bias+BN folded)
    y1 = relu(a1*(y0@W1) + c1)
    logit = y1 . w2                                  (+b2, softmax-inv.)
    att = softmax_L(mask ? logit : -2^32+1) @ keys

is computable block-by-block entirely in VMEM, with a streaming
(running max / running sum) softmax over L blocks, flash-attention
style.  Per grid step every reshape is a LEADING-dim merge/split
([Lb, Gb, .] <-> [Lb*Gb, .]) — never a lane-dim split, which Mosaic
would have to relayout.

Train mode keeps the XLA path: train-mode BN needs batch statistics
over the full [B, L, G] extent, which breaks blockwise locality (and
the backward wants XLA's autodiff anyway).

The final-layer bias b2 shifts every logit equally and cancels in the
softmax, so the kernel omits it — the returned attention output is
mathematically identical (differential-tested to float noise in
tests/test_pallas_attention.py).

Padding semantics: L is padded to the block size with mask=0 rows —
they contribute exp(-2^32+1 - max) == 0, exactly like the reference's
masked positions.  G is padded to the group-block size with duplicate
query 0; the padded group rows are sliced off the output.  An
all-masked row would differ from the reference (which softmaxes to
uniform over the REAL L) only in including the pad positions; the
loaders guarantee min sequence length >= 1 so the case cannot occur.
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_PADDING_VALUE = -(2.0 ** 32) + 1  # clsr.py:375

_state = threading.local()


def eval_attention_enabled() -> bool:
    """True while an eval/serving step is being traced with
    `use_pallas_eval_attention` on (steps.py:make_eval_step_fn)."""
    return bool(getattr(_state, "enabled", False))


def active_eval_mesh():
    """(mesh, flat) while a MESH eval step is being traced, else None.

    Set by parallel/mesh.py:make_sharded_eval_step for EVERY mesh eval
    trace — including data-parallel-only meshes (model_parallel=1),
    where the table context (parallel.embedding.active_mesh) is None
    but the batch is still sharded, so a bare pallas_call must never be
    traced into the GSPMD program."""
    return getattr(_state, "mesh_info", None)


@contextlib.contextmanager
def use_eval_attention_mesh(mesh, flat: bool):
    prev = getattr(_state, "mesh_info", None)
    _state.mesh_info = (mesh, flat)
    try:
        yield
    finally:
        _state.mesh_info = prev


def train_attention_enabled() -> bool:
    """True while a TRAIN step is being traced with
    `use_pallas_train_attention` on (steps.py:make_train_step_fn) —
    gates the two-pass fused train scorer (fused_train_attention)."""
    return bool(getattr(_state, "train_enabled", False))


def active_train_mesh():
    """(mesh, flat) while a MESH train step is being traced with the
    train kernel enabled, else None — routes the scorer through
    fused_train_attention_mesh (shard_map island with GLOBAL batch-BN
    collectives) instead of a bare pallas_call in the GSPMD program."""
    return getattr(_state, "train_mesh_info", None)


@contextlib.contextmanager
def use_train_attention_mesh(mesh, flat: bool):
    prev = getattr(_state, "train_mesh_info", None)
    _state.train_mesh_info = (mesh, flat)
    try:
        yield
    finally:
        _state.train_mesh_info = prev


@contextlib.contextmanager
def use_train_attention(enabled: bool):
    prev = getattr(_state, "train_enabled", False)
    _state.train_enabled = enabled
    try:
        yield
    finally:
        _state.train_enabled = prev


@contextlib.contextmanager
def use_eval_attention(enabled: bool):
    """Trace-time gate for the fused eval scorer.

    Single-device eval builders call the kernel directly.  The mesh
    eval builders also enable it (VERDICT r2 item 4): a pallas_call has
    no GSPMD partitioning rule, but the scorer is per-batch-row pure, so
    the call site (ops/attention.py) wraps it in `shard_map` with the
    batch axes manual and the folded weights replicated
    (fused_eval_attention_mesh below)."""
    prev = getattr(_state, "enabled", False)
    _state.enabled = enabled
    try:
        yield
    finally:
        _state.enabled = prev


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _scorer_kernel(q_ref, kp_ref, keys_ref, mask_ref,
                   wk_ref, wq_ref, wm_ref, a0_ref, c0_ref,
                   w1_ref, a1_ref, c1_ref, w2_ref,
                   out_ref, m_s, s_s, acc_s, *, n_l: int, ct):
    """One (b, g_block, l_block) grid step.

    q_ref   [1, Gb, D]   queries for this group block
    kp_ref  [1, Lb, D]   projected keys (keys @ attention_mat)
    keys_ref[1, Lb, Dk]  raw keys (the weighted-sum values)
    mask_ref[1, Lb, 1]   1.0 = valid position (pre-shaped [B, L, 1]: the
                         comparison is born [Lb, 1] — Mosaic cannot insert
                         a minor dim on the i1 vector a [Lb] mask produces)
    w*_ref               folded scorer weights (see fused_eval_attention)
    out_ref [1, Gb, Dk]  attention output block
    m_s/s_s [1, Gb] f32  running max / sum        (scratch)
    acc_s   [Gb, Dk] f32 running weighted values  (scratch)
    """
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _init():
        m_s[:] = jnp.full(m_s.shape, -jnp.inf, m_s.dtype)
        s_s[:] = jnp.zeros(s_s.shape, s_s.dtype)
        acc_s[:] = jnp.zeros(acc_s.shape, acc_s.dtype)

    q = q_ref[0].astype(ct)                      # [Gb, D]
    kp = kp_ref[0].astype(ct)                    # [Lb, D]
    Lb, D = kp.shape
    Gb = q.shape[0]

    # first layer, split-block formulation (ops/mlp.py:SplitFirstDense)
    tk = jnp.dot(kp, wk_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)        # [Lb, H0]
    tq = jnp.dot(q, wq_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)        # [Gb, H0]
    kq = kp[:, None, :] * q[None, :, :]                      # [Lb, Gb, D]
    H0 = wm_ref.shape[1]
    x0 = jnp.dot(kq.reshape(Lb * Gb, D), wm_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)         # [Lb*Gb, H0]
    x0 = (x0.reshape(Lb, Gb, H0) + tk[:, None, :] + tq[None, :, :])
    y0 = jnp.maximum(x0 * a0_ref[:] + c0_ref[:], 0.0)        # BN+bias+relu

    H1 = w1_ref.shape[1]
    x1 = jnp.dot(y0.reshape(Lb * Gb, H0).astype(ct), w1_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)         # [Lb*Gb, H1]
    y1 = jnp.maximum(x1 * a1_ref[:] + c1_ref[:], 0.0)
    logits = jnp.sum(y1.reshape(Lb, Gb, H1) * w2_ref[:], axis=-1)  # [Lb, Gb]

    valid = mask_ref[0] > 0.0                                # [Lb, 1]
    logits = jnp.where(valid, logits, MASK_PADDING_VALUE)

    # streaming softmax over the L grid axis
    blk_max = jnp.max(logits, axis=0, keepdims=True)         # [1, Gb]
    m_new = jnp.maximum(m_s[:], blk_max)
    rescale = jnp.exp(m_s[:] - m_new)                        # [1, Gb]
    p = jnp.exp(logits - m_new)                              # [Lb, Gb]
    s_s[:] = s_s[:] * rescale + jnp.sum(p, axis=0, keepdims=True)
    keys = keys_ref[0].astype(jnp.float32)                   # [Lb, Dk]
    pv = jax.lax.dot_general(p, keys, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [Gb, Dk]
    acc_s[:] = acc_s[:] * rescale[0][:, None] + pv
    m_s[:] = m_new

    @pl.when(l_idx == n_l - 1)
    def _finish():
        out_ref[0] = (acc_s[:] / s_s[0][:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "block_g",
                                             "compute_dtype", "interpret"))
def fused_eval_attention(keys: jnp.ndarray, keys_proj: jnp.ndarray,
                         query: jnp.ndarray, mask: jnp.ndarray,
                         wk_eff: jnp.ndarray, wq_eff: jnp.ndarray,
                         wm: jnp.ndarray,
                         a0: jnp.ndarray, c0: jnp.ndarray,
                         w1: jnp.ndarray, a1: jnp.ndarray, c1: jnp.ndarray,
                         w2: jnp.ndarray,
                         *, block_l: int = 128, block_g: int = 32,
                         compute_dtype: Optional[str] = None,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused eval-mode grouped target attention.

    keys [B, L, Dk], keys_proj [B, L, D], query [B, G, D], mask [B, L].
    wk_eff = W0[k-block] + W0[d-block], wq_eff = W0[q-block] - W0[d-block],
    wm = W0[m-block]  (the SplitFirstDense decomposition of the concat
    [k, q, k-q, k*q] first layer, kernel [4D, H0]).
    a_i / c_i: per-channel affine folding layer i's dense bias and
    eval-mode BN (identity: a=1, c=bias).  w2 [H1]: output kernel
    (bias omitted — softmax-invariant).

    Returns att_fea [B, G, Dk] (f32).
    """
    B, L, Dk = keys.shape
    _, _, D = keys_proj.shape
    G = query.shape[1]
    H0 = wm.shape[1]
    H1 = w1.shape[1]
    # Kernel-internal math is ALWAYS f32: under compute_dtype=bfloat16
    # the broadcast kq = kp[:,None,:]*q[None,:,:] lowers to a bf16
    # minor-dim-inserting tpu.reshape that this Mosaic toolchain rejects
    # ("infer-vector-layout: unsupported shape cast", observed round 5
    # on v5e).  bf16 callers keep their HBM savings — the kernel's
    # INPUT refs (keys/query/weights) arrive in the caller's dtype and
    # are upcast on load; the scorer is VMEM-resident so the internal
    # dtype costs no HBM traffic, and f32 accumulation only tightens
    # the numerics vs the XLA bf16 path.
    del compute_dtype
    ct = jnp.float32
    if interpret is None:   # CPU (tests' virtual mesh) has no Mosaic
        interpret = jax.default_backend() == "cpu"

    bl = min(block_l, max(8, L))
    bg = min(block_g, max(8, G))
    Lp = _cdiv(L, bl) * bl
    Gp = _cdiv(G, bg) * bg
    if Lp != L:
        pad = Lp - L
        keys = jnp.pad(keys, ((0, 0), (0, pad), (0, 0)))
        keys_proj = jnp.pad(keys_proj, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    if Gp != G:
        query = jnp.pad(query, ((0, 0), (0, Gp - G), (0, 0)))
    n_l = Lp // bl
    n_g = Gp // bg

    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_scorer_kernel, n_l=n_l, ct=ct),
        out_shape=jax.ShapeDtypeStruct((B, Gp, Dk), f32),
        grid=(B, n_g, n_l),
        in_specs=[
            pl.BlockSpec((1, bg, D), lambda b, g, l: (b, g, 0),
                         memory_space=pltpu.VMEM),      # query
            pl.BlockSpec((1, bl, D), lambda b, g, l: (b, l, 0),
                         memory_space=pltpu.VMEM),      # keys_proj
            pl.BlockSpec((1, bl, Dk), lambda b, g, l: (b, l, 0),
                         memory_space=pltpu.VMEM),      # keys
            pl.BlockSpec((1, bl, 1), lambda b, g, l: (b, l, 0),
                         memory_space=pltpu.VMEM),      # mask
            pl.BlockSpec((D, H0), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # wk_eff
            pl.BlockSpec((D, H0), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # wq_eff
            pl.BlockSpec((D, H0), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # wm
            pl.BlockSpec((1, H0), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # a0
            pl.BlockSpec((1, H0), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # c0
            pl.BlockSpec((H0, H1), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec((1, H1), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # a1
            pl.BlockSpec((1, H1), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # c1
            pl.BlockSpec((1, H1), lambda b, g, l: (0, 0),
                         memory_space=pltpu.VMEM),      # w2
        ],
        out_specs=pl.BlockSpec((1, bg, Dk), lambda b, g, l: (b, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, bg), f32),     # running max
            pltpu.VMEM((1, bg), f32),     # running sum
            pltpu.VMEM((bg, Dk), f32),    # running weighted values
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * Gp * (D * H0 + H0 * H1)
            + 2 * B * Lp * D * H0 + 2 * B * Gp * D * H0,
            bytes_accessed=4 * B * Lp * (D + Dk) * n_g + 4 * B * Gp * D,
            transcendentals=B * Lp * Gp,
        ),
        interpret=interpret,
    )(query, keys_proj, keys, mask[:, :, None],
      wk_eff.astype(ct), wq_eff.astype(ct), wm.astype(ct),
      a0.reshape(1, H0).astype(f32), c0.reshape(1, H0).astype(f32),
      w1.astype(ct),
      a1.reshape(1, H1).astype(f32), c1.reshape(1, H1).astype(f32),
      w2.reshape(1, H1).astype(f32))
    return out[:, :G]


def fused_eval_attention_mesh(mesh, flat: bool, keys, keys_proj, query,
                              mask, *folded,
                              compute_dtype: Optional[str] = None):
    """fused_eval_attention under a (data, model) mesh.

    pallas_call has no GSPMD partitioning rule, but the scorer is pure
    per batch row: wrap it in `shard_map` with the batch axes manual
    (each device runs the kernel on its own [B/n, L/G] block) and the
    folded eval-BN affines/weights replicated — so sharded eval and
    multi-chip serving keep the kernel's 4.4x instead of falling back
    to the XLA path (VERDICT r2 item 4)."""
    from jax.sharding import PartitionSpec as P

    from clsr_tpu.parallel.embedding import batch_axes
    bax = batch_axes(flat)

    def local(k, kp, q, m, *w):
        return fused_eval_attention(k, kp, q, m, *w,
                                    compute_dtype=compute_dtype)

    t3 = P(bax, None, None)
    in_specs = (t3, t3, t3, P(bax, None)) + (P(),) * len(folded)
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=t3, check_vma=False)(
        keys, keys_proj, query, mask, *folded)


def fused_train_attention_mesh(mesh, flat: bool, keys, keys_proj, query,
                               mask, *params,
                               compute_dtype: Optional[str] = None,
                               enable_bn: bool = True):
    """fused_train_attention under a (data, model) mesh.

    Unlike eval, the train scorer is NOT per-batch-row pure: train-mode
    BN statistics span the GLOBAL [B, L, G] extent.  The two-pass
    structure makes the mesh form natural anyway — each shard's stats
    kernels produce local per-channel partial sums, one psum over the
    batch axes globalizes them (psum_axes), and the fold + eval kernel
    run shard-locally.  The custom-VJP backward recomputes with the
    same pmean'd global stats, so gradients equal the single-device
    trace exactly (differential-tested in tests/test_pallas_mesh.py).

    params: (k0, b0, scale0, shift0, w1, b1, scale1, shift1, w2),
    replicated.  Returns (att [B, G, Dk] batch-sharded, biased mean0,
    var0, mean1, var1 — identical on every shard)."""
    from jax.sharding import PartitionSpec as P

    from clsr_tpu.parallel.embedding import batch_axes
    bax = batch_axes(flat)
    axes = bax if isinstance(bax, tuple) else (bax,)

    def local(k, kp, q, m, *ps):
        return fused_train_attention(k, kp, q, m, *ps,
                                     compute_dtype=compute_dtype,
                                     enable_bn=enable_bn,
                                     psum_axes=axes)

    t3 = P(bax, None, None)
    rep = P()
    in_specs = (t3, t3, t3, P(bax, None)) + (rep,) * len(params)
    out_specs = (t3, rep, rep, rep, rep)
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
        keys, keys_proj, query, mask, *params)


_STATS_BB = 8   # batch rows per stats grid step (Mosaic: the block's
                # second-to-last dim must be a multiple of 8)


def _stats_x0(q_ref, kp_ref, wk_ref, wq_ref, wm_ref, ct):
    """Shared blockwise x0 = SplitFirstDense(kp, q) for a [bb, Lb|G, D]
    block pair — returns [bb, Lb, G, H0] f32 (biasless)."""
    q = q_ref[...].astype(ct)                     # [bb, G, D]
    kp = kp_ref[...].astype(ct)                   # [bb, Lb, D]
    bb, Lb, D = kp.shape
    G = q.shape[1]
    H0 = wm_ref.shape[1]
    tk = jnp.dot(kp.reshape(bb * Lb, D), wk_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)     # [bb*Lb, H0]
    tq = jnp.dot(q.reshape(bb * G, D), wq_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)     # [bb*G, H0]
    kq = kp[:, :, None, :] * q[:, None, :, :]            # [bb, Lb, G, D]
    x0 = jnp.dot(kq.reshape(bb * Lb * G, D), wm_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)
    return (x0.reshape(bb, Lb, G, H0)
            + tk.reshape(bb, Lb, H0)[:, :, None, :]
            + tq.reshape(bb, G, H0)[:, None, :, :])


def _stats_mask(x, l_idx, b_idx, l_real, b_real):
    """Zero x's L-block-padding and B-padding rows (padded batch rows
    matter in pass B, where relu(c0) @ W1 is nonzero even for all-zero
    inputs).  Full-shape broadcasted_iota — Mosaic has no relayout for
    unit-dim broadcast reshapes of accumulated vectors."""
    shape = x.shape                                  # [bb, Lb, G, H]
    lids = l_idx * shape[1] + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bids = b_idx * shape[0] + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return jnp.where((lids < l_real) & (bids < b_real), x, 0.0)


def _stats0_kernel(q_ref, kp_ref, wk_ref, wq_ref, wm_ref,
                   sum_ref, sq_ref, s_acc, q_acc, *, n_l: int,
                   l_real: int, b_real: int, ct):
    """Pass A of the two-pass train-mode BN fold: per-channel sum and
    sum-of-squares of the BIASLESS first-layer pre-BN activations x0,
    accumulated blockwise in VMEM — x0 itself never touches HBM.

    Rows beyond the real L/B (block padding) are excluded; mask=0 rows
    within L are INCLUDED, exactly like the XLA path, whose BN sees the
    full [B, L, G] extent (ops/mlp.py FcnNet).  Grid step = (b_block,
    l_block) with _STATS_BB batch rows per step; outputs are per-
    batch-row partial sums [B, H], reduced outside."""
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        s_acc[:] = jnp.zeros(s_acc.shape, s_acc.dtype)
        q_acc[:] = jnp.zeros(q_acc.shape, q_acc.dtype)

    x0 = _stats_x0(q_ref, kp_ref, wk_ref, wq_ref, wm_ref, ct)
    x0 = _stats_mask(x0, l_idx, pl.program_id(0), l_real, b_real)
    s_acc[:] = s_acc[:] + jnp.sum(x0, axis=(1, 2))
    q_acc[:] = q_acc[:] + jnp.sum(x0 * x0, axis=(1, 2))

    @pl.when(l_idx == n_l - 1)
    def _finish():
        sum_ref[...] = s_acc[...]
        sq_ref[...] = q_acc[...]


def _stats1_kernel(q_ref, kp_ref, wk_ref, wq_ref, wm_ref, a0_ref, c0_ref,
                   w1_ref, sum_ref, sq_ref, s_acc, q_acc, *, n_l: int,
                   l_real: int, b_real: int, ct):
    """Pass B: recompute x0 blockwise, apply the pass-A folded affine +
    relu, and accumulate the per-channel sums of the BIASLESS second-
    layer pre-BN activations x1 = y0 @ W1."""
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        s_acc[:] = jnp.zeros(s_acc.shape, s_acc.dtype)
        q_acc[:] = jnp.zeros(q_acc.shape, q_acc.dtype)

    x0 = _stats_x0(q_ref, kp_ref, wk_ref, wq_ref, wm_ref, ct)
    bb, Lb, G, H0 = x0.shape
    y0 = jnp.maximum(x0 * a0_ref[:] + c0_ref[:], 0.0)
    H1 = w1_ref.shape[1]
    x1 = jnp.dot(y0.reshape(bb * Lb * G, H0).astype(ct),
                 w1_ref[:].astype(ct),
                 preferred_element_type=jnp.float32)   # [bb*Lb*G, H1]
    x1 = _stats_mask(x1.reshape(bb, Lb, G, H1), l_idx, pl.program_id(0),
                     l_real, b_real)
    s_acc[:] = s_acc[:] + jnp.sum(x1, axis=(1, 2))
    q_acc[:] = q_acc[:] + jnp.sum(x1 * x1, axis=(1, 2))

    @pl.when(l_idx == n_l - 1)
    def _finish():
        sum_ref[...] = s_acc[...]
        sq_ref[...] = q_acc[...]


def _stats_call(kernel, extra_inputs, extra_specs, B, bl, n_l, D, G,
                H_out, H0, query, keys_proj, wk_eff, wq_eff, wm,
                interpret, ct, l_real):
    f32 = jnp.float32
    bb = _STATS_BB
    Bp = _cdiv(B, bb) * bb
    if Bp != B:
        query = jnp.pad(query, ((0, Bp - B), (0, 0), (0, 0)))
        keys_proj = jnp.pad(keys_proj, ((0, Bp - B), (0, 0), (0, 0)))
    w_spec = pl.BlockSpec((D, H0), lambda b, l: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, H_out), lambda b, l: (b, 0),
                            memory_space=pltpu.VMEM)
    sums, sqs = pl.pallas_call(
        functools.partial(kernel, n_l=n_l, l_real=l_real, b_real=B,
                          ct=ct),
        out_shape=(jax.ShapeDtypeStruct((Bp, H_out), f32),
                   jax.ShapeDtypeStruct((Bp, H_out), f32)),
        grid=(Bp // bb, n_l),
        in_specs=[
            pl.BlockSpec((bb, G, D), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bl, D), lambda b, l: (b, l, 0),
                         memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec,
        ] + extra_specs,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((bb, H_out), f32),
                        pltpu.VMEM((bb, H_out), f32)],
        interpret=interpret,
    )(query, keys_proj, wk_eff, wq_eff, wm, *extra_inputs)
    return sums, sqs


def _gmean(x, axes, psum_axes):
    """Mean over local array axes, then over the mesh batch axes when
    `psum_axes` is set (equal per-shard extents -> pmean is exact)."""
    m = jnp.mean(x, axis=axes)
    if psum_axes is not None:
        m = jax.lax.pmean(m, psum_axes)
    return m


def _xla_train_scorer(keys, keys_proj, query, mask, k0, b0, scale0,
                      shift0, w1, b1, scale1, shift1, w2,
                      enable_bn=True, eps=1e-4, psum_axes=None):
    """Pure-XLA train-mode scorer math — the EXACT computation the flax
    FcnNet train path performs (SplitFirstDense -> train BN -> relu,
    x2 -> softmax over L -> weighted sum), used as the custom-VJP
    backward of the fused path: gradients are the true train-BN
    gradients (including the through-batch-stats terms), evaluated by
    recomputation (flash-style remat — nothing [B, L, G, H]-sized is
    saved between forward and backward).

    With `psum_axes` (inside a shard_map over the mesh batch axes) the
    batch statistics are GLOBAL over the full [B, L, G] extent via
    pmean — identical math to the single-device trace, and the VJP's
    through-stats terms transpose to the matching collectives."""
    D = keys_proj.shape[-1]
    ct = keys_proj.dtype
    wk, wq, wd, wm = k0[:D], k0[D:2 * D], k0[2 * D:3 * D], k0[3 * D:]
    tk = jnp.einsum("bld,dh->blh", keys_proj, (wk + wd).astype(ct))
    tq = jnp.einsum("bgd,dh->bgh", query, (wq - wd).astype(ct))
    x0 = (jnp.einsum("bld,bgd,dh->blgh", keys_proj, query,
                     wm.astype(ct))
          + tk[:, :, None, :] + tq[:, None, :, :]
          + b0.astype(ct)).astype(jnp.float32)
    if enable_bn:
        mean0 = _gmean(x0, (0, 1, 2), psum_axes)
        var0 = _gmean(jnp.square(x0), (0, 1, 2),
                      psum_axes) - jnp.square(mean0)
        y0 = jnp.maximum(scale0 * (x0 - mean0) * jax.lax.rsqrt(var0 + eps)
                         + shift0, 0.0)
    else:
        mean0 = var0 = jnp.zeros(x0.shape[-1], jnp.float32)
        y0 = jnp.maximum(x0, 0.0)
    x1 = (jnp.einsum("blgh,hk->blgk", y0.astype(ct), w1.astype(ct))
          + b1.astype(ct)).astype(jnp.float32)
    if enable_bn:
        mean1 = _gmean(x1, (0, 1, 2), psum_axes)
        var1 = _gmean(jnp.square(x1), (0, 1, 2),
                      psum_axes) - jnp.square(mean1)
        y1 = jnp.maximum(scale1 * (x1 - mean1) * jax.lax.rsqrt(var1 + eps)
                         + shift1, 0.0)
    else:
        mean1 = var1 = jnp.zeros(x1.shape[-1], jnp.float32)
        y1 = jnp.maximum(x1, 0.0)
    logits = jnp.einsum("blgk,k->blg", y1, w2)
    masked = jnp.where(mask[:, :, None] > 0, logits, MASK_PADDING_VALUE)
    w = jax.nn.softmax(masked, axis=1)
    att = jnp.einsum("blg,bld->bgd", w, keys)
    return att, mean0, var0, mean1, var1


def _fused_train_impl(keys, keys_proj, query, mask, k0, b0, scale0,
                      shift0, w1, b1, scale1, shift1, w2,
                      block_l, compute_dtype, interpret, enable_bn,
                      psum_axes=None, eps=1e-4):
    B, L, Dk = keys.shape
    D = keys_proj.shape[-1]
    G = query.shape[1]
    H0 = w1.shape[0]
    H1 = w1.shape[1]
    # f32 internal math always — the bf16 broadcast kq product lowers to
    # a minor-dim-inserting tpu.reshape this Mosaic toolchain rejects
    # (same pathology as fused_eval_attention above); bf16 callers keep
    # their HBM-side savings, kernels are VMEM-resident.
    ct = jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    wk, wq, wd, wm = k0[:D], k0[D:2 * D], k0[2 * D:3 * D], k0[3 * D:]
    wk_eff = (wk + wd).astype(ct)
    wq_eff = (wq - wd).astype(ct)
    wmc = wm.astype(ct)

    bl = min(block_l, max(8, L))
    # The stats kernels keep [_STATS_BB, bl, G, H]-shaped intermediates
    # (kq, x0, x0^2, mask iotas) live at once, each lane-padded to 128
    # and sublane-padded (G=5 -> 8) by Mosaic — at bl=128 that is ~25MB
    # and overflows the 16MB scoped-vmem stack (measured on v5e at the
    # Kuaishou L=250 shape).  Cap their L block at 32 (~6MB), with
    # their own padding; the eval kernel (1 batch row per grid step)
    # keeps the full block_l.
    bls = min(bl, 32)
    Lps = _cdiv(L, bls) * bls
    n_ls = Lps // bls
    qf = query.astype(jnp.float32)
    kpf_s = (jnp.pad(keys_proj, ((0, 0), (0, Lps - L), (0, 0)))
             if Lps != L else keys_proj).astype(jnp.float32)

    f32 = jnp.float32

    def gsum(x):
        """Sum the per-row partial sums; global over the mesh batch
        axes inside a shard_map (psum_axes)."""
        s = jnp.sum(x, axis=0)
        if psum_axes is not None:
            s = jax.lax.psum(s, psum_axes)
        return s

    if enable_bn:
        n_rows = B * L * G
        if psum_axes is not None:
            n_rows = n_rows * jax.lax.psum(jnp.float32(1.0), psum_axes)
        s0, q0 = _stats_call(_stats0_kernel, [], [], B, bls, n_ls, D, G,
                             H0, H0, qf, kpf_s, wk_eff, wq_eff, wmc,
                             interpret, ct, L)
        mean0 = gsum(s0) / n_rows                 # biasless x0 mean
        var0 = gsum(q0) / n_rows - jnp.square(mean0)
        a0 = scale0 * jax.lax.rsqrt(var0 + eps)
        c0 = shift0 - a0 * mean0                  # bias folds: see notes
        extra = [a0.reshape(1, H0).astype(f32),
                 c0.reshape(1, H0).astype(f32), w1.astype(ct)]
        extra_specs = [
            pl.BlockSpec((1, H0), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H0), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H0, H1), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        s1, q1 = _stats_call(_stats1_kernel, extra, extra_specs, B, bls,
                             n_ls, D, G, H1, H0, qf, kpf_s, wk_eff,
                             wq_eff, wmc, interpret, ct, L)
        mean1 = gsum(s1) / n_rows
        var1 = gsum(q1) / n_rows - jnp.square(mean1)
        a1 = scale1 * jax.lax.rsqrt(var1 + eps)
        c1 = shift1 - a1 * mean1
        stats = (mean0 + b0, var0, mean1 + b1, var1)
    else:
        # no BN: train == eval up to (absent) dropout; the affine is
        # identity-scale with the dense biases as shifts
        a0, c0 = jnp.ones((H0,), f32), b0.astype(f32)
        a1, c1 = jnp.ones((H1,), f32), b1.astype(f32)
        stats = (jnp.zeros((H0,), f32), jnp.zeros((H0,), f32),
                 jnp.zeros((H1,), f32), jnp.zeros((H1,), f32))

    att = fused_eval_attention(
        keys.astype(f32), keys_proj.astype(f32), qf,
        mask.astype(f32), wk + wd, wq - wd, wm, a0, c0, w1, a1, c1, w2,
        block_l=block_l, compute_dtype=compute_dtype,
        interpret=interpret)
    # running-stat updates store the BIASED means (the BN input includes
    # the dense bias; variance is shift-invariant)
    return (att,) + stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def fused_train_attention(keys, keys_proj, query, mask, k0, b0, scale0,
                          shift0, w1, b1, scale1, shift1, w2,
                          block_l=128, compute_dtype=None,
                          interpret=None, enable_bn=True,
                          psum_axes=None):
    """TRAIN-mode fused grouped target-attention scorer (VERDICT r3
    item 2b: the round-2 named lever).

    Train-mode BN needs batch statistics over the full [B, L, G]
    extent, which the eval kernel's blockwise locality cannot see — so
    the forward runs TWO-PASS: two tiny stats kernels accumulate the
    per-channel sums of the pre-BN activations blockwise in VMEM
    (pass A: x0; pass B: x1 after the pass-A fold), the batch stats
    fold into per-channel affines exactly like eval-mode BN, and the
    existing fused eval kernel produces the attention output.  Nothing
    [B, L, G, H]-sized ever reaches HBM — forward OR backward.

    Backward is the exact train-BN gradient: a custom VJP re-evaluates
    the pure-XLA train scorer (_xla_train_scorer — including the
    d(batch mean/var)/dx coupling flax's BatchNorm has) at the saved
    inputs and takes its VJP, i.e. flash-style rematerialization.

    Returns (att_fea [B, G, Dk] f32, biased mean0, var0, mean1, var1)
    — the mean/var outputs feed the BN running-statistics update
    (ops/mlp.py FcnNet manual_bn_stats).
    """
    return _fused_train_impl(keys, keys_proj, query, mask, k0, b0,
                             scale0, shift0, w1, b1, scale1, shift1, w2,
                             block_l, compute_dtype, interpret,
                             enable_bn, psum_axes)


def _fta_fwd(keys, keys_proj, query, mask, k0, b0, scale0, shift0, w1,
             b1, scale1, shift1, w2, block_l, compute_dtype, interpret,
             enable_bn, psum_axes):
    out = _fused_train_impl(keys, keys_proj, query, mask, k0, b0,
                            scale0, shift0, w1, b1, scale1, shift1, w2,
                            block_l, compute_dtype, interpret, enable_bn,
                            psum_axes)
    return out, (keys, keys_proj, query, mask, k0, b0, scale0, shift0,
                 w1, b1, scale1, shift1, w2)


def _fta_bwd(block_l, compute_dtype, interpret, enable_bn, psum_axes,
             res, g):
    # exact rematerialized gradient of the XLA train-mode scorer; the
    # stats outputs' cotangents flow too (they are zero in practice —
    # running-stat updates are not differentiated).  Under a mesh the
    # recompute uses the same GLOBAL pmean stats, so the through-stats
    # gradient terms transpose to the matching collectives.
    _, vjp = jax.vjp(
        functools.partial(_xla_train_scorer, enable_bn=enable_bn,
                          psum_axes=psum_axes), *res)
    return vjp(g)


fused_train_attention.defvjp(_fta_fwd, _fta_bwd)


def fold_scorer_params(fcn_params, fcn_stats, D: int, enable_bn: bool):
    """Fold an att_fcn FcnNet's params (+ eval-mode BN stats) into the
    kernel's (wk_eff, wq_eff, wm, a0, c0, w1, a1, c1, w2) form.

    fcn_params: the FcnNet param subtree {w_nn_layer0: {kernel, bias},
    bn0: {scale, bias}, w_nn_layer1: ..., bn1: ..., w_nn_output: ...};
    fcn_stats: matching batch_stats subtree ({bn0: {mean, var}, ...})
    when enable_bn.  BN epsilon 1e-4 (base_model.py:673-679).
    """
    k0 = fcn_params["w_nn_layer0"]["kernel"]
    b0 = fcn_params["w_nn_layer0"]["bias"]
    wk, wq, wd, wm = (k0[:D], k0[D:2 * D], k0[2 * D:3 * D], k0[3 * D:])
    w1 = fcn_params["w_nn_layer1"]["kernel"]
    b1 = fcn_params["w_nn_layer1"]["bias"]
    w2 = fcn_params["w_nn_output"]["kernel"][:, 0]

    def fold(bn_name, bias):
        if not enable_bn:
            return jnp.ones_like(bias), bias
        scale = fcn_params[bn_name]["scale"]
        shift = fcn_params[bn_name]["bias"]
        mean = fcn_stats[bn_name]["mean"]
        var = fcn_stats[bn_name]["var"]
        a = scale * jax.lax.rsqrt(var + 1e-4)
        return a, (bias - mean) * a + shift

    a0, c0 = fold("bn0", b0)
    a1, c1 = fold("bn1", b1)
    return (wk + wd, wq - wd, wm, a0, c0, w1, a1, c1, w2)
