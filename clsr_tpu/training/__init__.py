from clsr_tpu.training.negative_sampling import sample_in_batch_negatives, expand_with_negatives  # noqa: F401
from clsr_tpu.training.losses import total_loss, LossParts  # noqa: F401
from clsr_tpu.training.optimizer import build_optimizer  # noqa: F401
from clsr_tpu.training.state import TrainState, create_train_state  # noqa: F401
from clsr_tpu.training.steps import make_train_step, make_eval_step  # noqa: F401
from clsr_tpu.training.trainer import Trainer  # noqa: F401
from clsr_tpu.training.evaluator import run_weighted_eval  # noqa: F401
