from clsr_tpu.training.negative_sampling import (  # noqa: F401
    sample_in_batch_negatives, expand_with_negatives, expand_nextitnet)
from clsr_tpu.training.losses import total_loss, LossParts  # noqa: F401
from clsr_tpu.training.optimizer import build_optimizer  # noqa: F401
from clsr_tpu.training.lazy_adam import make_lazy_optimizer  # noqa: F401
from clsr_tpu.training.state import TrainState, create_train_state  # noqa: F401
from clsr_tpu.training.steps import (  # noqa: F401
    make_train_step, make_train_step_fn, make_multi_train_step,
    make_eval_step, stack_batches)
from clsr_tpu.training.trainer import Trainer  # noqa: F401
from clsr_tpu.training.evaluator import run_weighted_eval, predict_to_file  # noqa: F401
