"""Training driver: epoch loop, early stopping, checkpointing.

Mirrors SequentialBaseModel.fit (sequential_base_model.py:111-202):
per-epoch reshuffled train pass, weighted eval on the valid file, early
stop with patience cfg.early_stop on cfg.eval_metric (wauc on the CLSR
path, sequential.py:57,359), checkpoint-on-improvement.

Checkpoints are orbax-backed and include optimizer state and BN running
statistics, enabling true resume-of-training (the reference's tf.train.Saver
restore path is eval-only — SURVEY.md section 5)."""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from clsr_tpu.config import Config
from clsr_tpu.data.loader import SequenceLoader
from clsr_tpu.data.prefetch import prefetch_to_device
from clsr_tpu.training.evaluator import run_weighted_eval
from clsr_tpu.training.state import TrainState, create_train_state
from clsr_tpu.training.steps import (make_eval_step, make_multi_train_step,
                                     make_train_step)
from clsr_tpu.utils.summaries import SummaryWriter


class Trainer:
    def __init__(self, model, cfg: Config, sample_batch,
                 rng: Optional[jax.Array] = None, log=print):
        self.model = model
        self.cfg = cfg
        self.log = log
        self.state = create_train_state(model, cfg, sample_batch, rng)
        self._mesh = None
        self._flat_batch = False
        self._batch_sharding = None
        self._place_item = None   # per-item device placement for the
                                  # stacked streaming path (None = default
                                  # device_put inside prefetch)
        if cfg.data_parallel * cfg.model_parallel > 1:
            # mesh-parallel path: batch over 'data', tables row-sharded
            # over 'model' (parallel/mesh.py)
            from clsr_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                make_sharded_eval_step,
                                                make_sharded_train_step,
                                                place_state,
                                                resolve_flat_batch,
                                                shard_batch)
            self._mesh = make_mesh(cfg.data_parallel, cfg.model_parallel)
            shard_emb = cfg.model_parallel > 1
            self._shard_emb = shard_emb
            flat = resolve_flat_batch(cfg)
            self._flat_batch = flat
            base_state = self.state
            self.state = place_state(base_state, self._mesh, shard_emb,
                                     cfg)
            self.train_step = make_sharded_train_step(
                model, cfg, self._mesh, base_state, shard_emb, flat)
            self._batch_sharding = batch_sharding(self._mesh, flat)
            inner_eval = make_sharded_eval_step(
                model, cfg, self._mesh, base_state, shard_emb, flat)
            mesh = self._mesh
            n_data = cfg.data_parallel * (cfg.model_parallel if flat else 1)

            def sharded_eval(state, batch):
                rows = batch.users.shape[0]
                pad = (-rows) % n_data
                if pad:
                    batch = jax.tree_util.tree_map(
                        lambda x: np.concatenate(
                            [np.asarray(x),
                             np.zeros((pad,) + np.asarray(x).shape[1:],
                                      np.asarray(x).dtype)]),
                        batch)
                preds, alpha = inner_eval(state,
                                          shard_batch(batch, mesh, flat))
                return preds[:rows], alpha[:rows]

            self.eval_step = sharded_eval
            self._multi_step = None
            if cfg.train_steps_per_call > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from clsr_tpu.parallel.mesh import \
                    make_sharded_multi_train_step
                self._multi_step = make_sharded_multi_train_step(
                    model, cfg, self._mesh, base_state,
                    cfg.train_steps_per_call, shard_emb, flat)
                from clsr_tpu.parallel.embedding import batch_axes
                stacked_sh = jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, P(None, batch_axes(flat))),
                    self._batch_sharding)
                single_sh = self._batch_sharding

                def place_item(item):
                    sh = (stacked_sh if item.users.ndim == 2
                          else single_sh)
                    return jax.tree_util.tree_map(
                        lambda x, s: jax.device_put(np.asarray(x), s),
                        item, sh)

                self._place_item = place_item
        else:
            self.train_step = make_train_step(model, cfg)
            self.eval_step = make_eval_step(model, cfg)
            self._multi_step = None
            if cfg.train_steps_per_call > 1:
                self._multi_step = make_multi_train_step(
                    model, cfg, cfg.train_steps_per_call)
        self.best_epoch = 0
        self.eval_history: List[Tuple[int, Dict[str, float]]] = []
        self._ckpt = ocp.StandardCheckpointer() if cfg.model_dir else None
        self.summary = SummaryWriter(cfg.summaries_dir, cfg.write_tfevents)
        # activation/embedding histogram probe (cfg.write_histograms —
        # the reference's tf.summary.histogram stream); built lazily in
        # fit() once a loader provides a probe batch
        self._hist_step = None
        self._hist_probe = None
        # device-resident train data (data/resident.py) — built lazily in
        # fit(); on a mesh the rows are sharded over the batch axes and
        # batches assembled by gather_batch_mesh (resident.py)
        self._resident = None
        self._resident_multi = None
        self._resident_single = None
        # length-bucketed resident data (cfg.length_buckets):
        # [(ResidentDataset, dataset row ids)] + per-bucket eligible
        # local row ids — built lazily alongside _resident
        self._buckets = None
        self._bucket_elig = None
        self._bn_refresh = None

    # ------------------------------------------------------------------
    def _use_resident(self, train_loader: SequenceLoader) -> bool:
        cfg = self.cfg
        if cfg.resident_data == "off":
            return False
        if self._mesh is not None:
            # mesh path needs equal per-device batch blocks
            from clsr_tpu.parallel.embedding import batch_axes
            n = int(np.prod([self._mesh.shape[a]
                             for a in batch_axes(self._flat_batch)]))
            if cfg.batch_size % n:
                return False
        if cfg.resident_data == "on":
            return True
        from clsr_tpu.data.resident import resident_nbytes_estimate
        est = resident_nbytes_estimate(
            len(train_loader.ds), cfg.max_seq_length)
        return est <= cfg.resident_max_bytes

    def _resident_epoch(self, train_loader: SequenceLoader, rng,
                        np_rng, step0: int, resume_info=None):
        """One training epoch over device-resident data.

        Loss totals accumulate ON DEVICE; the host syncs once per
        cfg.show_step window for logging and once at epoch end — never per
        call (a device->host read through the dev-chip relay costs ~140ms).

        With cfg.autosave_every_calls > 0, the full run state (model +
        optimizer + epoch-loop position) is persisted to
        <model_dir>/autosave every N dispatches (training/checkpoint.py);
        `resume_info` (from Trainer.fit(resume=True)) re-enters the loop
        at the saved call boundary with the saved permutation and rng —
        the continued run is bit-identical to an uninterrupted one.

        Returns (rng, n_steps, epoch_loss).
        """
        from clsr_tpu.data.resident import (build_resident,
                                            build_resident_buckets,
                                            build_resident_mesh,
                                            epoch_permutation,
                                            make_mesh_resident_multi_step,
                                            make_mesh_resident_step,
                                            make_resident_multi_step,
                                            make_resident_step,
                                            resolve_bucket_paddings)
        cfg = self.cfg
        if self._resident is None and self._buckets is None:
            pads = resolve_bucket_paddings(cfg, train_loader.view.lengths)
            if pads:
                # length-aware batching (VERDICT r4 item 1): one
                # bucket-padded resident dataset + compiled program per
                # Lb (the jitted step fns retrace per res shape); call
                # order is shuffled ACROSS buckets per epoch
                self._buckets = build_resident_buckets(
                    train_loader.view, pads, self._mesh, self._flat_batch,
                    round_rows=cfg.resident_round_rows)
                self._bucket_elig = [
                    np.flatnonzero(train_loader.view.lengths[rows]
                                   >= cfg.min_seq_length)
                    for _, rows in self._buckets]
                self.log("length buckets (Lb x rows): " + ", ".join(
                    f"{res.seq_len}x{res.n_rows}"
                    for res, _ in self._buckets))
            if self._mesh is not None:
                if self._buckets is None:
                    from clsr_tpu.data.resident import pad_view_rows
                    self._resident = build_resident_mesh(
                        pad_view_rows(train_loader.view,
                                      cfg.resident_round_rows),
                        self._mesh, self._flat_batch)
                self._resident_single = make_mesh_resident_step(
                    self.model, cfg, self._mesh, self.state,
                    self._shard_emb, self._flat_batch)
                if cfg.train_steps_per_call > 1:
                    self._resident_multi = make_mesh_resident_multi_step(
                        self.model, cfg, self._mesh, self.state,
                        cfg.train_steps_per_call, self._shard_emb,
                        self._flat_batch)
            else:
                if self._buckets is None:
                    from clsr_tpu.data.resident import pad_view_rows
                    self._resident = build_resident(
                        pad_view_rows(train_loader.view,
                                      cfg.resident_round_rows))
                self._resident_single = make_resident_step(self.model, cfg)
                if cfg.train_steps_per_call > 1:
                    self._resident_multi = make_resident_multi_step(
                        self.model, cfg, cfg.train_steps_per_call)
        if self._buckets is not None:
            return self._bucketed_epoch(rng, np_rng, step0)
        B = cfg.batch_size
        K = cfg.train_steps_per_call if self._resident_multi else 1
        calls_done = 0
        total = data_total = None
        if resume_info is not None and resume_info["n_calls"] >= 0:
            # mid-epoch resume: the saved permutation/layout + loss
            # accumulators; rng/np_rng were restored by fit()
            perm = resume_info["perm"]
            n_use, n_calls, n_tail = (resume_info["n_use"],
                                      resume_info["n_calls"],
                                      resume_info["n_tail"])
            calls_done = resume_info["calls_done"]
            if calls_done:
                total = jnp.asarray(resume_info["total"], jnp.float32)
                data_total = jnp.asarray(resume_info["data_total"],
                                         jnp.float32)
        else:
            eligible = np.flatnonzero(
                train_loader.view.lengths >= cfg.min_seq_length)
            perm, n_use, n_calls, n_tail = epoch_permutation(
                eligible, np_rng, B, K, cfg.drop_remainder_min)
            if self._resident_multi is None:
                n_calls, n_tail = 0, n_calls
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            perm_dev = jax.device_put(
                perm, NamedSharding(self._mesh, P()))
        else:
            perm_dev = jax.device_put(perm)
        n_dev = np.int32(n_use)

        step, n_steps = step0, 0

        def account(n_new, parts):
            nonlocal total, data_total, step, n_steps
            ls, dl = parts.loss.sum(), parts.data_loss.sum()
            total = ls if total is None else total + ls
            data_total = dl if data_total is None else data_total + dl
            prev = step
            step += n_new
            n_steps += n_new
            if (cfg.show_step
                    and step // cfg.show_step > prev // cfg.show_step):
                loss_avg = float(ls) / n_new       # deliberate sync
                dl_avg = float(dl) / n_new
                self.log(f"step {step}, total_loss: {loss_avg:.4f}, "
                         f"data_loss: {dl_avg:.4f}")
                self.summary.scalars(
                    step, {"loss": loss_avg, "data_loss": dl_avg})
                self._maybe_histograms(step)

        epoch = getattr(self, "_cur_epoch", 0)

        def autosave(done):
            if not cfg.autosave_every_calls:
                return
            if done % cfg.autosave_every_calls:
                return
            self._autosave(epoch, done, step, rng, np_rng, perm, n_use,
                           n_calls, n_tail, total, data_total)

        for c in range(min(calls_done, n_calls), n_calls):
            rng, sub = jax.random.split(rng)
            self.state, parts = self._resident_multi(
                self.state, self._resident, perm_dev, n_dev,
                np.int32(c * K * B), sub)
            account(K, parts)
            autosave(c + 1)
        for t in range(max(0, calls_done - n_calls), n_tail):
            rng, sub = jax.random.split(rng)
            self.state, parts = self._resident_single(
                self.state, self._resident, perm_dev, n_dev,
                np.int32((n_calls * K + t) * B), sub)
            account(1, parts)
            autosave(n_calls + t + 1)
        epoch_loss = float(total) if total is not None else 0.0
        return rng, n_steps, epoch_loss

    def _bucketed_epoch(self, rng, np_rng, step0: int):
        """One epoch over length-bucketed resident data
        (cfg.length_buckets; data/resident.py:build_resident_buckets).

        Each bucket gets its own epoch permutation over its eligible
        local rows; the resulting (bucket, call) slots are shuffled so
        the optimizer sees buckets interleaved, not curriculum-ordered.
        Every batch is single-bucket — in-batch negatives draw from
        length-correlated rows (the deliberate semantic deviation from
        global shuffling; quality cell in docs/RESULTS_r5.md).
        """
        from clsr_tpu.data.resident import epoch_permutation
        cfg = self.cfg
        B = cfg.batch_size
        K = cfg.train_steps_per_call if self._resident_multi else 1
        slots = []      # (bucket_idx, perm_dev, n_use, flat row offset)
        for bi, ((res, _rows), elig) in enumerate(
                zip(self._buckets, self._bucket_elig)):
            perm, n_use, n_calls, n_tail = epoch_permutation(
                elig, np_rng, B, K, cfg.drop_remainder_min)
            if self._resident_multi is None:
                n_calls, n_tail = 0, n_calls
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                perm_dev = jax.device_put(
                    perm, NamedSharding(self._mesh, P()))
            else:
                perm_dev = jax.device_put(perm)
            n_dev = np.int32(n_use)
            for c in range(n_calls):
                slots.append((bi, perm_dev, n_dev, c * K * B, True))
            for t in range(n_tail):
                slots.append((bi, perm_dev, n_dev,
                              (n_calls * K + t) * B, False))
        order = np_rng.permutation(len(slots)) if slots else []

        step, n_steps = step0, 0
        total = data_total = None
        for bi, perm_dev, n_dev, off, is_multi in (slots[i]
                                                   for i in order):
            rng, sub = jax.random.split(rng)
            res = self._buckets[bi][0]
            fn = self._resident_multi if is_multi else self._resident_single
            self.state, parts = fn(self.state, res, perm_dev, n_dev,
                                   np.int32(off), sub)
            n_new = K if is_multi else 1
            ls, dl = parts.loss.sum(), parts.data_loss.sum()
            total = ls if total is None else total + ls
            data_total = dl if data_total is None else data_total + dl
            prev = step
            step += n_new
            n_steps += n_new
            if (cfg.show_step
                    and step // cfg.show_step > prev // cfg.show_step):
                loss_avg = float(ls) / n_new       # deliberate sync
                dl_avg = float(dl) / n_new
                self.log(f"step {step}, total_loss: {loss_avg:.4f}, "
                         f"data_loss: {dl_avg:.4f}")
                self.summary.scalars(
                    step, {"loss": loss_avg, "data_loss": dl_avg})
                self._maybe_histograms(step)

        # BN running-stat recalibration before eval: the K-step dispatch
        # runs are bucket-homogeneous and longer than the momentum-0.95
        # EMA horizon (~20 steps), so the raw epoch-end running stats
        # reflect the LAST-visited bucket's activation distribution, not
        # the mixture eval needs (measured -12 to -14pt GAUC without
        # this — docs/RESULTS_r5.md).  ~bn_refresh_batches forward-only
        # single batches, round-robin across buckets, re-estimate them
        # at ~0.1s/epoch.
        if (len(self._buckets) > 1 and cfg.bn_refresh_batches > 0
                and self.state.batch_stats):
            if self._bn_refresh is None:
                from clsr_tpu.data.resident import (
                    make_mesh_resident_bn_refresh, make_resident_bn_refresh)
                if self._mesh is not None:
                    self._bn_refresh = make_mesh_resident_bn_refresh(
                        self.model, cfg, self._mesh, self.state,
                        self._shard_emb, self._flat_batch)
                else:
                    self._bn_refresh = make_resident_bn_refresh(
                        self.model, cfg)
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                place = lambda a: jax.device_put(
                    a, NamedSharding(self._mesh, P()))
            else:
                place = jax.device_put
            for r in range(cfg.bn_refresh_batches):
                bi = r % len(self._buckets)
                elig = self._bucket_elig[bi]
                idx = np_rng.choice(elig, size=B).astype(np.int32)
                rng, sub = jax.random.split(rng)
                self.state = self._bn_refresh(
                    self.state, self._buckets[bi][0], place(idx), sub)

        epoch_loss = float(total) if total is not None else 0.0
        return rng, n_steps, epoch_loss

    def _maybe_histograms(self, step: int) -> None:
        """Mirror of the reference's tf.summary.histogram stream
        (clsr.py:111-276), at the show_step cadence: run the jitted
        histogram step (training/steps.py:make_histogram_step) on the
        fixed probe batch and write the device-computed buckets."""
        if self._hist_step is None or self._hist_probe is None:
            return
        hists = self._hist_step(self.state, self._hist_probe)
        self.summary.histograms(step, jax.device_get(hists))

    def _autosave_stream(self, epoch, calls_done, step, rng, np_mt0,
                         epoch_loss) -> None:
        """Streaming-path run-state autosave (VERDICT r4 item 7): stores
        the EPOCH-START host-rng state (np_mt0) so resume can regenerate
        the identical epoch iterator and skip `calls_done` items."""
        from clsr_tpu.training.checkpoint import save_run_state
        auto = os.path.join(self.cfg.model_dir, "autosave")
        self.save(os.path.join(auto, "state"))
        tmp = np.random.RandomState(0)
        tmp.set_state(np_mt0)
        save_run_state(
            auto, epoch=epoch, calls_done=calls_done, step=step, rng=rng,
            np_rng=tmp, perm=np.zeros(0, np.int32), n_use=0, n_calls=-1,
            n_tail=0, total=float(epoch_loss), data_total=0.0,
            best_metric=self._best_metric, best_epoch=self.best_epoch,
            mode="stream")

    def _autosave(self, epoch, calls_done, step, rng, np_rng, perm,
                  n_use, n_calls, n_tail, total, data_total) -> None:
        """Persist full run state for exact mid-epoch resume
        (training/checkpoint.py; VERDICT r3 item 7)."""
        from clsr_tpu.training.checkpoint import save_run_state
        auto = os.path.join(self.cfg.model_dir, "autosave")
        self.save(os.path.join(auto, "state"))
        save_run_state(
            auto, epoch=epoch, calls_done=calls_done, step=step, rng=rng,
            np_rng=np_rng, perm=np.asarray(perm), n_use=n_use,
            n_calls=n_calls, n_tail=n_tail,
            total=float(total) if total is not None else 0.0,
            data_total=(float(data_total) if data_total is not None
                        else 0.0),
            best_metric=self._best_metric, best_epoch=self.best_epoch)

    # ------------------------------------------------------------------
    def fit(self, train_loader: SequenceLoader,
            valid_loader: SequenceLoader,
            valid_num_ngs: Optional[int] = None,
            np_rng: Optional[np.random.RandomState] = None,
            resume: bool = False) -> "Trainer":
        cfg = self.cfg
        if valid_num_ngs is None:
            valid_num_ngs = cfg.valid_num_ngs
        if cfg.need_sample and cfg.train_num_ngs < 1:
            raise ValueError(
                "Please specify a positive integer of negative numbers for "
                "training without sampling needed.")
        if valid_num_ngs < 1:
            raise ValueError(
                "Please specify a positive integer of negative numbers for "
                "validation.")
        np_rng = np_rng or np.random.RandomState(cfg.seed)
        rng = jax.random.PRNGKey(
            cfg.seed if cfg.seed is not None else int(time.time()))

        if cfg.write_histograms and not cfg.summaries_dir:
            self.log("WARNING: write_histograms is set but summaries_dir "
                     "is empty — no histograms will be written")
        if (cfg.write_histograms and cfg.summaries_dir
                and self._hist_step is None):
            from clsr_tpu.training.steps import make_histogram_step
            self._hist_step = make_histogram_step(self.model, cfg)
            # fixed probe batch: distributions stay comparable across
            # steps (the reference histograms whatever batch is in
            # flight; a fixed probe is the deliberate deviation)
            self._hist_probe = next(train_loader.train_batches(
                cfg.batch_size, np.random.RandomState(0)))

        best_metric = 0.0
        self.best_epoch = 0
        step = 0
        start_epoch = 1
        use_resident = self._use_resident(train_loader)
        resume_info = None
        if resume:
            if not cfg.model_dir:
                raise ValueError("resume requires model_dir")
            from clsr_tpu.training.checkpoint import load_run_state
            auto = os.path.join(cfg.model_dir, "autosave")
            resume_info = load_run_state(auto)
            if resume_info is not None:
                stream_saved = resume_info["mode"] == "stream"
                if stream_saved and use_resident:
                    raise ValueError(
                        "the autosave was written by the STREAMING path "
                        "but this run resolves to resident data — pass "
                        "resident_data=off to resume it")
                if not stream_saved and not use_resident:
                    raise ValueError(
                        "the autosave was written by the RESIDENT path "
                        "but this run streams — pass resident_data="
                        "auto/on to resume it")
                if cfg.length_buckets != "off":
                    raise ValueError(
                        "mid-epoch resume is not supported with "
                        "length_buckets (the autosaved run state stores "
                        "a single epoch permutation)")
                self.load(os.path.join(auto, "state"))
                np_rng = resume_info["np_rng"]
                rng = resume_info["rng"]
                best_metric = resume_info["best_metric"]
                self.best_epoch = resume_info["best_epoch"]
                step = resume_info["step"]
                start_epoch = resume_info["epoch"]
                self.log(f"resuming at epoch {start_epoch}, call "
                         f"{resume_info['calls_done']} (step {step})")
            else:
                self.log("resume requested but no autosave found — "
                         "starting fresh")
        self._best_metric = best_metric
        for epoch in range(start_epoch, cfg.epochs + 1):
            self._cur_epoch = epoch
            t0 = time.time()
            epoch_loss = 0.0
            n_steps = 0
            def emit(n_new, parts, scale=1.0):
                nonlocal step, n_steps, epoch_loss
                prev = step
                step += n_new
                n_steps += n_new
                loss = float(parts.loss) * scale / max(n_new, 1)
                epoch_loss += float(parts.loss) * scale
                if cfg.show_step and step // cfg.show_step > prev // cfg.show_step:
                    self.log(
                        f"step {step}, total_loss: {loss:.4f}, "
                        f"data_loss: "
                        f"{float(parts.data_loss) * scale / max(n_new, 1):.4f}")
                    self.summary.scalars(step, {
                        "loss": loss,
                        "data_loss": float(parts.data_loss) * scale / max(n_new, 1),
                    })
                    self._maybe_histograms(step)

            K = cfg.train_steps_per_call
            if use_resident:
                rng, n_steps, epoch_loss = self._resident_epoch(
                    train_loader, rng, np_rng, step,
                    resume_info=(resume_info if epoch == start_epoch
                                 else None))
                step += n_steps
            else:
                # streaming path (stacked multi-step or per-batch).
                # Mid-epoch resume (VERDICT r4 item 7): the loaders draw
                # their permutation from np_rng INSIDE the iterator, so
                # the autosave stores the EPOCH-START np_rng state; on
                # resume the identical iterator is rebuilt and the first
                # `calls_done` items are skipped host-side.
                np_mt0 = np_rng.get_state()
                calls_done = 0
                if (resume_info is not None and epoch == start_epoch
                        and resume_info["mode"] == "stream"):
                    calls_done = resume_info["calls_done"]
                    epoch_loss = resume_info["total"]
                if self._multi_step is not None:
                    # epoch-permute-once zero-copy stacked views; H2D
                    # upload overlaps the previous dispatch's K-step scan
                    items = train_loader.train_batches_stacked(
                        cfg.batch_size, K, np_rng,
                        min_seq_length=cfg.min_seq_length)
                else:
                    items = train_loader.train_batches(
                        cfg.batch_size, np_rng,
                        min_seq_length=cfg.min_seq_length)
                for _ in range(calls_done):      # resume: skip, no device work
                    next(items, None)
                if cfg.prefetch_batches > 0:
                    items = prefetch_to_device(
                        items, cfg.prefetch_batches,
                        place_fn=self._place_item,
                        sharding=(None if self._multi_step is not None
                                  else self._batch_sharding))
                for item in items:
                    rng, sub = jax.random.split(rng)
                    if item.users.ndim == 2:      # [K, B, ...] stacked
                        if (cfg.prefetch_batches <= 0
                                and self._place_item is not None):
                            item = self._place_item(item)
                        self.state, parts = self._multi_step(
                            self.state, item, sub)
                        emit(K, jax.tree_util.tree_map(
                            lambda x: x.sum(), parts))
                    else:                          # tail / single steps
                        self.state, parts = self.train_step(
                            self.state, item, sub)
                        emit(1, parts)
                    calls_done += 1
                    if (cfg.autosave_every_calls and calls_done
                            % cfg.autosave_every_calls == 0):
                        self._autosave_stream(epoch, calls_done, step,
                                              rng, np_mt0, epoch_loss)
            train_time = time.time() - t0

            t0 = time.time()
            valid_res = run_weighted_eval(
                self.eval_step, self.state, valid_loader, cfg, valid_num_ngs)
            eval_time = time.time() - t0
            self.log(
                "eval valid at epoch {0}: {1}".format(
                    epoch, ",".join(f"{k}:{v}" for k, v in valid_res.items())))
            self.log(f"epoch {epoch} train time {train_time:.1f}s "
                     f"({n_steps} steps), eval time {eval_time:.1f}s")
            self.eval_history.append((epoch, valid_res))
            self.summary.scalars(step, {f"valid/{k}": v
                                        for k, v in valid_res.items()})

            if self._mesh is not None and cfg.mesh_update_routing == "owner":
                # one scalar read at a boundary we already sync at; the
                # counter accumulates dropped (source, owner) bucket
                # entries from the O(M/m) owner-routed merge (lazy_adam)
                from clsr_tpu.training.lazy_adam import LazyAdamState
                if isinstance(self.state.opt_state, LazyAdamState):
                    ovf = int(jax.device_get(
                        self.state.opt_state.route_overflow))
                    if ovf and cfg.mesh_owner_overflow == "drop":
                        self.log(
                            f"WARNING: owner-routed update merge dropped "
                            f"{ovf} gradient bucket entries so far "
                            f"(mesh_owner_capacity too small for this id "
                            f"distribution — raise it, or use "
                            f"mesh_owner_overflow='fallback')")
                    elif ovf:
                        self.log(
                            f"NOTE: owner-routed update merge fell back "
                            f"to the broadcast merge for {ovf} bucket "
                            f"entries so far (lossless; raise "
                            f"mesh_owner_capacity to keep the O(M/m) "
                            f"wire bytes on those steps)")

            progress = False
            if valid_res[cfg.eval_metric] > best_metric:
                best_metric = valid_res[cfg.eval_metric]
                self._best_metric = best_metric
                self.best_epoch = epoch
                progress = True
            elif cfg.early_stop > 0 and epoch - self.best_epoch >= cfg.early_stop:
                self.log(f"early stop at epoch {epoch}!")
                break

            if cfg.save_model and cfg.model_dir and progress:
                self.save(os.path.join(cfg.model_dir, f"epoch_{epoch}"))

            if cfg.autosave_every_calls and epoch < cfg.epochs:
                # epoch boundary marker (next epoch starts fresh from the
                # restored np_rng) — covers a kill during eval / the next
                # epoch's first calls
                if use_resident:
                    # n_calls = -1: next epoch draws its permutation
                    # fresh from the restored np_rng
                    self._autosave(epoch + 1, 0, step, rng, np_rng,
                                   np.zeros(0, np.int32), -1, -1, -1,
                                   None, None)
                else:
                    self._autosave_stream(epoch + 1, 0, step, rng,
                                          np_rng.get_state(), 0.0)

        if cfg.autosave_every_calls and cfg.model_dir:
            # a completed fit must not be resumed into
            import shutil
            shutil.rmtree(os.path.join(cfg.model_dir, "autosave"),
                          ignore_errors=True)
        self.log(f"best epoch: {self.best_epoch}")
        return self

    # ------------------------------------------------------------------
    def _interleaved(self) -> bool:
        from clsr_tpu.parallel.rowmap import resolve_interleaved
        return (self._mesh is not None and self._shard_emb
                and resolve_interleaved(self.cfg))

    def save(self, path: str) -> None:
        """Checkpoints ALWAYS store the logical (id-ordered) row layout:
        with the interleaved mesh layout (parallel/rowmap.py) the
        row-sharded leaves are de-interleaved host-side first, so a
        checkpoint written on any topology/layout restores on any
        other."""
        path = os.path.abspath(path)
        ckpt = self._ckpt or ocp.StandardCheckpointer()
        state = self.state
        if self._interleaved():
            from clsr_tpu.parallel.rowmap import permute_state_rows
            state = permute_state_rows(
                jax.device_get(state), self._mesh, self._shard_emb,
                to_physical=False)
        ckpt.save(path, state, force=True)
        ckpt.wait_until_finished()
        from clsr_tpu.training.checkpoint import write_meta
        write_meta(path)   # schema version sidecar (checkpoint.py)

    def load(self, path: str) -> None:
        path = os.path.abspath(path)
        ckpt = self._ckpt or ocp.StandardCheckpointer()
        from clsr_tpu.training.checkpoint import restore_with_migration
        if self._interleaved():
            # restore into a LOGICAL host template, then re-place with
            # the interleave (place_state applies it from cfg)
            from clsr_tpu.parallel.mesh import place_state
            from clsr_tpu.parallel.rowmap import permute_state_rows
            host = permute_state_rows(
                jax.device_get(self.state), self._mesh, self._shard_emb,
                to_physical=False)
            restored, defaulted = restore_with_migration(ckpt, path, host)
            self.state = place_state(restored, self._mesh,
                                     self._shard_emb, self.cfg)
        else:
            self.state, defaulted = restore_with_migration(
                ckpt, path, self.state)
        if defaulted:
            self.log(f"checkpoint {path} predates schema leaves "
                     f"{defaulted}; migrated with initial values")

    def load_latest(self, model_dir: str) -> None:
        """tf.train.latest_checkpoint equivalent (sequential.py:352-353)."""
        epochs = ([d for d in os.listdir(model_dir) if d.startswith("epoch_")]
                  if os.path.isdir(model_dir) else [])
        if not epochs:
            raise IOError(
                f"Failed to find any matching files for {model_dir}")
        latest = max(epochs, key=lambda d: int(d.split("_")[1]))
        self.load(os.path.join(model_dir, latest))
