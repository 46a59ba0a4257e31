"""Loss semantics vs hand computations (reference base_model.py:191-238,
clsr.py:22-82)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.training import losses as LS


def _cfg(**kw):
    base = dict(model_type="clsr", user_vocab="u", item_vocab="i",
                cate_vocab="c", hidden_size=40)
    base.update(kw)
    return Config(**base).validate()


def test_grouped_softmax_is_mean_neglogp_of_positive(rng):
    B, G = 6, 5
    logits = rng.randn(B, G).astype(np.float32)
    labels = np.zeros((B, G), np.float32)
    labels[:, 0] = 1
    valid = np.ones(B, np.float32)
    got = float(LS.data_loss_fn(_cfg(), jnp.asarray(logits),
                                jnp.asarray(labels), jnp.asarray(valid)))
    # reference math: softmax across group, -group * mean over all entries
    # of log(where(label==1, p, 1)) == mean over groups of -log p_pos
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = float(np.mean(-np.log(p[:, 0])))
    assert got == pytest.approx(want, rel=1e-5)


def test_grouped_softmax_respects_valid_mask(rng):
    B, G = 6, 4
    logits = rng.randn(B, G).astype(np.float32)
    labels = np.zeros((B, G), np.float32)
    labels[:, 0] = 1
    valid = np.array([1, 1, 1, 1, 0, 0], np.float32)
    got = float(LS.data_loss_fn(_cfg(), jnp.asarray(logits),
                                jnp.asarray(labels), jnp.asarray(valid)))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = float(np.mean(-np.log(p[:4, 0])))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("loss", ["cross_entropy_loss", "log_loss",
                                  "square_loss"])
def test_pointwise_losses(rng, loss):
    B, G = 5, 3
    logits = rng.randn(B, G).astype(np.float32)
    labels = (rng.rand(B, G) > 0.5).astype(np.float32)
    valid = np.ones(B, np.float32)
    got = float(LS.data_loss_fn(_cfg(loss=loss), jnp.asarray(logits),
                                jnp.asarray(labels), jnp.asarray(valid)))
    sig = 1 / (1 + np.exp(-logits))
    if loss == "cross_entropy_loss":
        want = np.mean(np.maximum(logits, 0) - logits * labels
                       + np.log1p(np.exp(-np.abs(logits))))
    elif loss == "log_loss":
        eps = 1e-7
        want = np.mean(-(labels * np.log(sig + eps)
                         + (1 - labels) * np.log(1 - sig + eps)))
    else:
        want = np.sqrt(np.mean((sig - labels) ** 2))
    assert got == pytest.approx(float(want), rel=1e-5)


def _clsr_aux(rng, B, G, D):
    return {
        "att_fea_long": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "att_fea_short": jnp.asarray(rng.randn(B, G, D).astype(np.float32)),
        "hist_mean": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "hist_recent": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "seq_len": jnp.asarray(np.array([10.0] * B, np.float32)),
    }


def _batch_valid(B, G):
    z = np.zeros((B, G), np.float32)
    return Batch(users=np.zeros(B, np.int32), items=z.astype(np.int32),
                 cates=z.astype(np.int32), labels=z,
                 item_hist=np.zeros((B, 4), np.int32),
                 cate_hist=np.zeros((B, 4), np.int32),
                 mask=np.ones((B, 4), np.float32),
                 time_diff=np.zeros((B, 4), np.float32),
                 time_from_first=np.zeros((B, 4), np.float32),
                 time_to_now=np.zeros((B, 4), np.float32),
                 valid=np.ones(B, np.float32))


def test_bpr_contrastive_matches_reference_formula(rng):
    B, G, D = 4, 2, 6
    aux = _clsr_aux(rng, B, G, D)
    cfg = _cfg(contrastive_loss="bpr", contrastive_loss_weight=0.1,
               contrastive_length_threshold=5)
    got = float(LS.contrastive_loss_fn(cfg, aux, _batch_valid(B, G)))

    long_f = np.asarray(aux["att_fea_long"])[:, None, :].repeat(G, 1)
    short_f = np.asarray(aux["att_fea_short"])
    mean_f = np.asarray(aux["hist_mean"])[:, None, :].repeat(G, 1)
    recent_f = np.asarray(aux["hist_recent"])[:, None, :].repeat(G, 1)
    sp = lambda x: np.log1p(np.exp(x))
    term = lambda a, p, n: np.mean(sp(np.sum(a * (n - p), -1)))
    want = 0.1 * (term(long_f, mean_f, recent_f)
                  + term(short_f, recent_f, mean_f)
                  + term(mean_f, long_f, short_f)
                  + term(recent_f, short_f, long_f))
    assert got == pytest.approx(float(want), rel=1e-4)


def test_triplet_uses_per_dimension_margin(rng):
    # the reference's "triplet" sums max(0, d_ap - d_an + margin) PER
    # DIMENSION (clsr.py:60-67) — not over aggregated distances
    B, G, D = 3, 1, 4
    aux = _clsr_aux(rng, B, G, D)
    cfg = _cfg(contrastive_loss="triplet", triplet_margin=1.0,
               contrastive_loss_weight=1.0, contrastive_length_threshold=5)
    got = float(LS.contrastive_loss_fn(cfg, aux, _batch_valid(B, G)))

    long_f = np.asarray(aux["att_fea_long"])[:, None, :]
    short_f = np.asarray(aux["att_fea_short"])
    mean_f = np.asarray(aux["hist_mean"])[:, None, :]
    recent_f = np.asarray(aux["hist_recent"])[:, None, :]
    d = lambda a, b: (a - b) ** 2
    t = lambda ap, an: np.mean(np.sum(np.maximum(0, ap - an + 1.0), -1))
    want = (t(d(long_f, mean_f), d(long_f, recent_f))
            + t(d(short_f, recent_f), d(short_f, mean_f))
            + t(d(long_f, mean_f), d(short_f, mean_f))
            + t(d(short_f, recent_f), d(long_f, recent_f)))
    assert got == pytest.approx(float(want), rel=1e-4)


def test_contrastive_masked_out_below_threshold(rng):
    B, G, D = 4, 2, 6
    aux = _clsr_aux(rng, B, G, D)
    aux["seq_len"] = jnp.asarray(np.array([3.0] * B, np.float32))  # <= 5
    cfg = _cfg(contrastive_loss="bpr", contrastive_length_threshold=5)
    got = float(LS.contrastive_loss_fn(cfg, aux, _batch_valid(B, G)))
    assert got == 0.0


def test_discrepancy_is_negative_mean_squared_diff():
    aux = {"discrepancy_sumsq": jnp.asarray(12.0),
           "discrepancy_count": jnp.asarray(4.0)}
    cfg = _cfg(discrepancy_loss_weight=0.01)
    got = float(LS.discrepancy_loss_fn(cfg, aux))
    assert got == pytest.approx(-0.01 * 3.0)


def test_attn_loss_extension(rng):
    import jax
    from clsr_tpu.models.registry import get_model_class
    from clsr_tpu.training.state import create_train_state
    from clsr_tpu.training.steps import make_train_step
    from tests.test_lazy_adam import _batch, L, B

    batch = _batch(np.random.RandomState(0), 30, 6, 20)
    results = {}
    for use in (False, True):
        cfg = Config(
            model_type="clsr", user_vocab="u", item_vocab="i",
            cate_vocab="c", max_seq_length=L, batch_size=B, train_num_ngs=2,
            hidden_size=12, item_embedding_dim=8, cate_embedding_dim=4,
            user_embedding_dim=12, layer_sizes=(16, 8),
            att_fcn_layer_sizes=(12, 6), seed=0, use_attn_loss=use,
            attn_loss_weight=10.0,
        ).validate()
        model = get_model_class("clsr")(cfg=cfg, n_users=20, n_items=30,
                                        n_cates=6)
        state = create_train_state(model, cfg, batch)
        step = make_train_step(model, cfg, donate=False)
        _, parts = step(state, batch, jax.random.PRNGKey(0))
        results[use] = float(parts.loss)
    # the supervised-attention term adds a positive contribution
    assert results[True] > results[False]
