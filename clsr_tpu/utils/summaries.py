"""Training observability.

Replaces the reference's tf.summary scalar/histogram stream
(clsr.py:448-455, sequential_base_model.py:140-146) with:
  * a JSONL scalar log (always on — cheap, greppable, plottable), and
  * optional TensorBoard event files when TensorFlow is importable
    (`write_tfevents` config flag, matching the reference's).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, log_dir: Optional[str], write_tfevents: bool = False):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            if write_tfevents:
                try:
                    import tensorflow as tf  # optional dependency
                    self._tb = tf.summary.create_file_writer(log_dir)
                except Exception:
                    self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        if self._jsonl is not None:
            rec = {"step": step, "time": time.time()}
            rec.update({k: float(v) for k, v in values.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=step)
            self._tb.flush()

    def histograms(self, step: int, hists) -> None:
        """Write device-computed activation histograms.

        `hists`: {tag: (counts [k], lo, hi[, n_nonfinite])} from
        training/steps.py:make_histogram_step — the TPU-native mirror of
        the reference's tf.summary.histogram stream (clsr.py:111-276).
        JSONL always; TensorBoard via the histogram plugin's [k, 3]
        (left edge, right edge, count) proto when tfevents are on.
        lo/hi are clamped to finite values so the JSONL stays strict
        JSON even if a caller hands in a non-finite range.
        """
        if self._jsonl is None and self._tb is None:
            return
        import numpy as np

        def fin(v):
            return float(np.nan_to_num(float(v), posinf=0.0, neginf=0.0))

        items = {tag: (np.asarray(t[0]), fin(t[1]), fin(t[2]),
                       int(t[3]) if len(t) > 3 else 0)
                 for tag, t in hists.items()}
        if self._jsonl is not None:
            for tag, (counts, lo, hi, bad) in sorted(items.items()):
                rec = {"step": step, "hist": tag, "lo": lo, "hi": hi,
                       "counts": counts.tolist()}
                if bad:
                    rec["nonfinite"] = bad
                self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            try:
                from tensorboard.plugins.histogram import \
                    metadata as hmeta
            except Exception:
                return
            with self._tb.as_default():
                for tag, (counts, lo, hi, _bad) in sorted(items.items()):
                    k = counts.shape[0]
                    edges = np.linspace(lo, hi, k + 1)
                    buckets = np.stack(
                        [edges[:-1], edges[1:],
                         counts.astype(np.float64)], axis=1)
                    tf.summary.write(
                        tag, tf.constant(buckets, tf.float64), step=step,
                        metadata=hmeta.create_summary_metadata(
                            display_name=tag, description=None))
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
