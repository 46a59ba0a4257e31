"""Scoring service (clsr_tpu/serving.py).

Round-trips a trained checkpoint into the service and checks that served
scores equal the eval path's predictions for the same (user, history,
candidates), across shape buckets and request mixes.
"""

import numpy as np
import pytest

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.parser import parse_file
from clsr_tpu.data.synthetic import write_synthetic_dataset
from clsr_tpu.data.vocab import load_vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.serving import ScoreRequest, ScoringService
from clsr_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("serve_ds")
    paths = write_synthetic_dataset(str(out), n_users=40, n_items=80,
                                    n_cates=8, valid_num_ngs=2,
                                    test_num_ngs=4, seed=5)
    uv, iv, cv = (load_vocab(paths["user_vocab"]),
                  load_vocab(paths["item_vocab"]),
                  load_vocab(paths["cate_vocab"]))
    cfg = Config(
        model_type="clsr", user_vocab="u", item_vocab="i", cate_vocab="c",
        max_seq_length=10, batch_size=16, train_num_ngs=2, valid_num_ngs=2,
        hidden_size=12, item_embedding_dim=8, cate_embedding_dim=4,
        user_embedding_dim=12, layer_sizes=(8,), activation=("relu",),
        att_fcn_layer_sizes=(8, 4), epochs=1, early_stop=0, show_step=0,
        save_model=True, model_dir=str(out / "ckpt"), seed=3,
    ).validate()
    model = get_model_class("clsr")(
        cfg=cfg, n_users=len(uv), n_items=len(iv), n_cates=len(cv))
    tl = SequenceLoader(parse_file(paths["train"], uv, iv, cv), 10)
    vl = SequenceLoader(parse_file(paths["valid"], uv, iv, cv), 10)
    tr = Trainer(model, cfg, next(tl.train_batches(
        16, np.random.RandomState(0))), log=lambda *_: None)
    tr.fit(tl, vl)
    tr.save(str(out / "ckpt" / "epoch_final"))
    return cfg, (uv, iv, cv), str(out / "ckpt" / "epoch_final"), tr


def _req(user, hist, cands, t0=1_500_600_000):
    return ScoreRequest(
        user=user,
        hist_items=[f"i{i}" for i in hist],
        hist_cates=[f"c{1 + (i - 1) % 8}" for i in hist],
        hist_times=[t0 - 3600 * (len(hist) - k) for k in range(len(hist))],
        current_time=t0,
        cand_items=[f"i{c}" for c in cands],
        cand_cates=[f"c{1 + (c - 1) % 8}" for c in cands],
    )


def test_service_scores_match_direct_eval(trained):
    cfg, (uv, iv, cv), ckpt, tr = trained
    svc = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, batch_buckets=(4,),
                         cand_buckets=(8,))
    reqs = [_req("u3", [1, 5, 9, 2], [7, 11, 3]),
            _req("u7", [4, 4, 8], [2, 6, 10, 14, 18])]
    scores = svc.score(reqs)
    assert [len(s) for s in scores] == [3, 5]
    for s in scores:
        assert np.isfinite(s).all() and (0 <= s).all() and (s <= 1).all()

    # cross-check against the trainer's eval_step on a hand-built batch
    from clsr_tpu.data.batch import Batch
    b = svc._empty_batch(4, 8)
    svc._fill_row(b, 0, reqs[0], 8)
    preds, _ = tr.eval_step(tr.state, b)
    np.testing.assert_allclose(np.asarray(preds)[0, :3], scores[0],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_service_bucket_routing_and_batching(trained):
    cfg, (uv, iv, cv), ckpt, _ = trained
    svc = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, batch_buckets=(2, 4),
                         cand_buckets=(4, 16))
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(9):
        n_hist = rng.randint(1, 10)
        n_cand = rng.randint(1, 16)
        reqs.append(_req(f"u{1 + i}", list(rng.randint(1, 80, n_hist)),
                         list(rng.randint(1, 80, n_cand))))
    scores = svc.score(reqs)
    for r, s in zip(reqs, scores):
        assert len(s) == len(r.cand_items)
        assert np.isfinite(s).all()
    # same request twice -> identical scores (stateless service)
    again = svc.score([reqs[0]])[0]
    np.testing.assert_allclose(again, scores[0], rtol=1e-6)


def test_multichip_service_matches_single(trained):
    """Mesh-served scores (4x2: rows over 'data', tables over 'model'
    via the collective embedding engine) == single-device scores."""
    cfg, (uv, iv, cv), ckpt, _ = trained
    kw = dict(batch_buckets=(4,), cand_buckets=(8,), checkpoint=ckpt)
    single = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                            **kw)
    mesh_cfg = cfg.replace(data_parallel=4, model_parallel=2)
    sharded = ScoringService(mesh_cfg, len(uv), len(iv), len(cv),
                             uv, iv, cv, **kw)
    assert sharded._mesh is not None
    reqs = [_req("u3", [1, 5, 9, 2], [7, 11, 3]),
            _req("u7", [4, 4, 8], [2, 6, 10, 14, 18]),
            _req("u9", [4, 8, 8, 2, 6], [2, 6, 10, 14])]
    a = single.score(reqs)
    b = sharded.score(reqs)
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(sb, sa, rtol=2e-5, atol=2e-6)


def test_async_frontend_coalesces_and_matches(trained):
    """Concurrent submit()s produce the same scores as a direct call and
    coalesce into fewer device dispatches than requests."""
    import threading

    from clsr_tpu.serving import AsyncScoringService

    cfg, (uv, iv, cv), ckpt, _ = trained
    svc = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, batch_buckets=(8,),
                         cand_buckets=(8,))
    rng = np.random.RandomState(1)
    reqs = [_req(f"u{1 + i}", list(rng.randint(1, 80, 5)),
                 list(rng.randint(1, 80, 4))) for i in range(12)]
    direct = svc.score(reqs)

    front = AsyncScoringService(svc, max_wait_ms=200.0)
    try:
        futs = [None] * len(reqs)

        def submit(i):
            futs[i] = front.submit(reqs[i])

        threads = [threading.Thread(target=submit, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = [f.result(timeout=60) for f in futs]
    finally:
        front.close()

    for d, g in zip(direct, got):
        np.testing.assert_allclose(g, d, rtol=1e-6)
    # 12 requests coalesced into far fewer frontend dispatches
    assert front.dispatches <= 3

    # closed frontend rejects new work
    with pytest.raises(RuntimeError):
        front.submit(reqs[0])


def test_async_frontend_propagates_errors(trained):
    from clsr_tpu.serving import AsyncScoringService

    cfg, (uv, iv, cv), ckpt, _ = trained
    svc = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, batch_buckets=(4,),
                         cand_buckets=(4,))
    front = AsyncScoringService(svc, max_wait_ms=1.0)
    try:
        bad = _req("u1", [1, 2], list(range(1, 20)))  # 19 > max bucket 4
        with pytest.raises(ValueError):
            front.submit(bad).result(timeout=60)
    finally:
        front.close()


def test_int8_tables_score_close_to_f32(trained):
    """int8 row-quantized serving tables: params stored int8 + scales,
    scores within quantization tolerance of the f32 service."""
    cfg, (uv, iv, cv), ckpt, _ = trained
    kw = dict(batch_buckets=(4,), cand_buckets=(8,))
    f32 = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, **kw)
    q8 = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                        checkpoint=ckpt, int8_tables=True, **kw)
    for name in ("item_embedding", "cate_embedding",
                 "user_long_embedding", "user_short_embedding"):
        assert q8.state.params[name].dtype == np.int8, name
        assert q8.state.params[f"{name}_scales"].dtype == np.float32
    reqs = [_req("u3", [1, 5, 9, 2], [7, 11, 3]),
            _req("u9", [4, 8, 8, 2, 6], [2, 6, 10, 14])]
    a = f32.score(reqs)
    b = q8.score(reqs)
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(sb, sa, atol=0.03)
        assert np.isfinite(sb).all()


def test_service_rejects_oversized_request(trained):
    cfg, (uv, iv, cv), ckpt, _ = trained
    svc = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv,
                         checkpoint=ckpt, cand_buckets=(4,))
    with pytest.raises(ValueError, match="candidates exceeds"):
        svc.score([_req("u1", [1], list(range(1, 7)))])


def test_int8_tables_on_mesh_match_single_device_int8(trained):
    """int8 row-quantized tables x mesh serving (flat batch): the
    collective gathers run on s8 rows (each id's row comes from exactly
    one owner shard, so the integer psum/psum_scatter is exact) and
    the scales ride the same engine — scores must equal the
    single-device int8 service to float noise."""
    cfg, (uv, iv, cv), ckpt, _ = trained
    kw = dict(batch_buckets=(4,), cand_buckets=(8,), checkpoint=ckpt,
              int8_tables=True)
    q8 = ScoringService(cfg, len(uv), len(iv), len(cv), uv, iv, cv, **kw)
    mesh_cfg = cfg.replace(data_parallel=4, model_parallel=2)
    q8m = ScoringService(mesh_cfg, len(uv), len(iv), len(cv),
                         uv, iv, cv, **kw)
    assert q8m._mesh is not None
    reqs = [_req("u3", [1, 5, 9, 2], [7, 11, 3]),
            _req("u7", [4, 4, 8], [2, 6, 10, 14, 18]),
            _req("u9", [4, 8, 8, 2, 6], [2, 6, 10, 14])]
    a = q8.score(reqs)
    b = q8m.score(reqs)
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(sb, sa, rtol=2e-5, atol=2e-6)
