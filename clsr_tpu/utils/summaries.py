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

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
