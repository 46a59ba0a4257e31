"""clsr_tpu — a TPU-native (JAX/XLA/Pallas) sequential-recommender framework.

A from-scratch rebuild of the capabilities of tsinghua-fib-lab/CLSR (WWW'22,
"Disentangling Long and Short-Term Interests for Recommendation"), designed
TPU-first: jit-compiled functional train/eval steps over a `jax.sharding.Mesh`,
`lax.scan` recurrent encoders with precomputed input projections, on-device
in-batch negative sampling, grouped target scoring (one history pass scores
all 1+n candidates), and row-shardable embedding tables.

Layer map (mirrors the reference's component inventory, SURVEY.md section 2):
  config    — typed experiment configuration (reference: deeprec_utils.py:327-534)
  data      — ETL, vocabularies, TSV parsing, batching/negative sampling
              (reference: dataset/sequential_reviews.py, io/sequential_iterator.py)
  ops       — recurrent cells, attention, MLP primitives
              (reference: models/sequential/rnn_cell_implement.py, base_model.py:595-708)
  models    — CLSR + baseline model zoo (reference: models/sequential/*.py)
  training  — losses, optimizer, trainer, evaluator (reference: base_model.py,
              sequential_base_model.py)
  metrics   — AUC/GAUC/MRR/NDCG@k/Hit@k and weighted variants
              (reference: deeprec_utils.py:554-821)
  parallel  — mesh + sharding runtime (no reference equivalent; TPU-native)
"""

__version__ = "0.1.0"

from clsr_tpu.config import Config, load_config  # noqa: F401
