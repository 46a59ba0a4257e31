"""Inference-only scoring service.

The reference has no serving path (predictions are dumped to a file from
the training session — sequential_base_model.py:326-347).  This module is
the TPU-native deployment shape (ROADMAP item 5):

  * `ScoringService` — restore a trained checkpoint + vocabs once, then
    `score(requests)` batches of (user, history, C candidates) through a
    jitted eval program.  The grouped-target design scores all C
    candidates of a request in ONE encoder pass (the [B, G] Batch
    layout, data/batch.py): the three recurrences, the long attention
    and the proxies run once per user; only the target-conditioned
    scorer/fusion/head fan out over candidates — the reference would
    re-encode the history once per candidate.
  * Static shape buckets — requests are padded to (batch, candidates)
    buckets so XLA compiles a handful of programs, not one per request
    shape; scores for padding are dropped before returning.
  * Device batching across concurrent requests: many users score in one
    dispatch.
  * Multi-chip serving: with cfg.data_parallel/model_parallel > 1 the
    service places the restored state on a (data, model) mesh — rows
    sharded over 'data', tables row-sharded over 'model' via the
    collective embedding engine (parallel/mesh.py, parallel/embedding.py)
    — so one service spans a slice instead of one chip.
  * `AsyncScoringService` — a thread-safe micro-batching frontend:
    callers submit() individual requests and get futures; a dispatcher
    thread coalesces whatever has queued (bounded by a wait window and
    a max batch) into shared device dispatches.

Throughput: scripts/bench_serving.py (candidates/s on one chip).
"""

from __future__ import annotations

import bisect
import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.data.parser import compute_time_features, time_range_for_unit
from clsr_tpu.data.vocab import Vocab
from clsr_tpu.models.registry import get_model_class
from clsr_tpu.training.state import create_train_state
from clsr_tpu.training.steps import make_eval_step


@dataclasses.dataclass
class ScoreRequest:
    """One user's scoring request (raw string tokens, like the TSV)."""

    user: str
    hist_items: Sequence[str]
    hist_cates: Sequence[str]
    hist_times: Sequence[float]
    current_time: float
    cand_items: Sequence[str]
    cand_cates: Sequence[str]


class ScoringService:
    """Checkpoint-backed candidate scorer with shape-bucketed batching."""

    def __init__(self, cfg: Config, n_users: int, n_items: int,
                 n_cates: int, user_vocab: Vocab, item_vocab: Vocab,
                 cate_vocab: Vocab,
                 checkpoint: Optional[str] = None,
                 batch_buckets: Sequence[int] = (8, 64),
                 cand_buckets: Sequence[int] = (16, 128, 512),
                 int8_tables: bool = False):
        self.cfg = cfg
        self.vocabs = (user_vocab, item_vocab, cate_vocab)
        self.model = get_model_class(cfg.model_type)(
            cfg=cfg, n_users=n_users, n_items=n_items, n_cates=n_cates)
        self.batch_buckets = sorted(batch_buckets)
        self.cand_buckets = sorted(cand_buckets)
        self._time_range = time_range_for_unit(cfg.time_unit)

        sample = self._empty_batch(self.batch_buckets[0],
                                   self.cand_buckets[0])
        self.state = create_train_state(self.model, cfg, sample)
        if checkpoint is not None:
            self.load(checkpoint)
        if int8_tables:
            self.quantize_tables()

        self._mesh = None
        self._n_data = 1
        if cfg.data_parallel * cfg.model_parallel > 1:
            # span a slice: rows over 'data', tables over 'model'
            from clsr_tpu.parallel.mesh import (make_mesh,
                                                make_sharded_eval_step,
                                                place_state,
                                                resolve_flat_batch,
                                                shard_batch)
            self._mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
            shard_emb = cfg.model_parallel > 1
            n_dev = cfg.data_parallel * cfg.model_parallel
            # flat data parallelism (parallel/embedding.py): request rows
            # shard over ALL devices, not just the 'data' axis (the
            # service pads request rows to _n_data, so pads_rows=True)
            flat = resolve_flat_batch(cfg, pads_rows=True)
            self._n_data = n_dev if flat else cfg.data_parallel
            base_state = self.state
            self.state = place_state(base_state, self._mesh, shard_emb,
                                     cfg)
            inner = make_sharded_eval_step(self.model, cfg, self._mesh,
                                           base_state, shard_emb, flat)
            mesh = self._mesh

            def sharded_step(state, batch):
                return inner(state, shard_batch(batch, mesh, flat))

            self._eval_step = sharded_step
        else:
            self._eval_step = make_eval_step(self.model, cfg)

    # ------------------------------------------------------------- int8
    def quantize_tables(self) -> None:
        """Row-quantize the embedding tables to int8 (4x less serving
        HBM and gather bandwidth).

        Symmetric per-row: scale = max|row| / 127, q = round(row /
        scale).  Adds `<name>_scales` [N, 1] f32 params; lookups
        dequantize after the gather (models/base.py:lookup_rows).
        Inference-only — never feed a quantized state to training."""
        params = dict(self.state.params)
        for name in list(params):
            if not str(name).endswith("_embedding"):
                continue
            table = np.asarray(params[name], np.float32)
            scale = np.abs(table).max(axis=1, keepdims=True) / 127.0
            scale = np.maximum(scale, 1e-12)
            q = np.clip(np.round(table / scale), -127, 127).astype(np.int8)
            params[name] = jax.device_put(q)
            params[f"{name}_scales"] = jax.device_put(
                scale.astype(np.float32))
        self.state = self.state.replace(params=params)

    # ------------------------------------------------------------- ckpt
    def load(self, path: str) -> None:
        import os

        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        self.state = ckpt.restore(os.path.abspath(path), self.state)

    def load_latest(self, model_dir: str) -> None:
        import os
        epochs = ([d for d in os.listdir(model_dir)
                   if d.startswith("epoch_")]
                  if os.path.isdir(model_dir) else [])
        if not epochs:
            raise IOError(
                f"Failed to find any matching files for {model_dir}")
        latest = max(epochs, key=lambda d: int(d.split("_")[1]))
        self.load(os.path.join(model_dir, latest))

    # ------------------------------------------------------------ batch
    def _bucket(self, buckets: Sequence[int], n: int) -> int:
        i = bisect.bisect_left(buckets, n)
        return buckets[min(i, len(buckets) - 1)]

    def _empty_batch(self, B: int, G: int) -> Batch:
        L = self.cfg.max_seq_length
        z = np.zeros
        return Batch(
            users=z(B, np.int32), items=z((B, G), np.int32),
            cates=z((B, G), np.int32), labels=z((B, G), np.float32),
            item_hist=z((B, L), np.int32), cate_hist=z((B, L), np.int32),
            mask=z((B, L), np.float32), time_diff=z((B, L), np.float32),
            time_from_first=z((B, L), np.float32),
            time_to_now=z((B, L), np.float32), valid=z(B, np.float32),
        )

    def _fill_row(self, batch: Batch, row: int, req: ScoreRequest,
                  G: int) -> None:
        uv, iv, cv = self.vocabs
        L = self.cfg.max_seq_length
        n = min(len(req.hist_items), L)
        hitems = iv.lookup_many(req.hist_items)
        hcates = cv.lookup_many(req.hist_cates)
        td, tff, ttn = compute_time_features(
            np.asarray(req.hist_times, np.float64), req.current_time,
            self._time_range)
        batch.users[row] = uv.lookup(req.user)
        batch.item_hist[row, :n] = hitems[-n:] if n else []
        batch.cate_hist[row, :n] = hcates[-n:] if n else []
        batch.mask[row, :n] = 1.0
        batch.time_diff[row, :n] = td[-n:]
        batch.time_from_first[row, :n] = tff[-n:]
        batch.time_to_now[row, :n] = ttn[-n:]
        C = len(req.cand_items)
        batch.items[row, :C] = iv.lookup_many(req.cand_items)
        batch.cates[row, :C] = cv.lookup_many(req.cand_cates)
        batch.valid[row] = 1.0

    # ------------------------------------------------------------ score
    def score(self, requests: List[ScoreRequest]) -> List[np.ndarray]:
        """Sigmoid scores per request, one array of len(cand_items) each.

        Requests are grouped by candidate-count bucket; each group pads
        to (batch bucket, cand bucket) and runs as one dispatch.
        """
        order: Dict[int, List[int]] = {}
        for i, req in enumerate(requests):
            if len(req.cand_items) > self.cand_buckets[-1]:
                raise ValueError(
                    f"request {i}: {len(req.cand_items)} candidates exceeds "
                    f"the largest bucket {self.cand_buckets[-1]}; raise "
                    f"cand_buckets or split the request")
            g = self._bucket(self.cand_buckets, len(req.cand_items))
            order.setdefault(g, []).append(i)

        out: List[Optional[np.ndarray]] = [None] * len(requests)
        for G, idxs in order.items():
            for lo in range(0, len(idxs), self.batch_buckets[-1]):
                chunk = idxs[lo:lo + self.batch_buckets[-1]]
                B = self._bucket(self.batch_buckets, len(chunk))
                # mesh path: rows shard over 'data' — round up so the
                # batch divides evenly across data shards
                B = -(-B // self._n_data) * self._n_data
                batch = self._empty_batch(B, G)
                for row, i in enumerate(chunk):
                    self._fill_row(batch, row, requests[i], G)
                preds, _ = self._eval_step(self.state, batch)
                preds = np.asarray(preds)
                for row, i in enumerate(chunk):
                    out[i] = preds[row, :len(requests[i].cand_items)].copy()
        return out   # type: ignore[return-value]


class AsyncScoringService:
    """Thread-safe micro-batching frontend over a ScoringService.

    Callers `submit()` single requests from any thread and receive
    futures; one dispatcher thread drains whatever has accumulated —
    bounded by `max_batch` rows and a `max_wait_ms` coalescing window —
    and runs it as shared bucketed device dispatches through
    `ScoringService.score`.  Under load, concurrent callers' requests
    ride the same device program instead of serializing one dispatch
    per caller.
    """

    def __init__(self, service: ScoringService, max_wait_ms: float = 2.0,
                 max_batch: Optional[int] = None):
        self._svc = service
        self._max_wait = max_wait_ms / 1e3
        self._max_batch = max_batch or service.batch_buckets[-1]
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self.dispatches = 0          # observability: device-call count
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ----------------------------------------------------------- client
    def submit(self, req: ScoreRequest) -> "Future[np.ndarray]":
        if self._closed:
            raise RuntimeError("service is closed")
        fut: "Future[np.ndarray]" = Future()
        self._q.put((req, fut))
        return fut

    def score(self, requests: List[ScoreRequest]) -> List[np.ndarray]:
        """Blocking convenience wrapper over submit()."""
        futs = [self.submit(r) for r in requests]
        return [f.result() for f in futs]

    def close(self) -> None:
        self._closed = True
        self._q.put(None)
        self._thread.join()

    # ------------------------------------------------------- dispatcher
    def _drain(self, first) -> List[Tuple[ScoreRequest, Future]]:
        import time
        items = [first]
        deadline = time.monotonic() + self._max_wait
        while len(items) < self._max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)    # keep the shutdown signal
                break
            items.append(nxt)
        return items

    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            items = self._drain(item)
            reqs = [r for r, _ in items]
            try:
                scores = self._svc.score(reqs)
            except Exception as e:        # noqa: BLE001 — fail the batch
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self.dispatches += 1
            for (_, fut), s in zip(items, scores):
                fut.set_result(s)
