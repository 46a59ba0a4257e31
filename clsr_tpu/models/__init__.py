from clsr_tpu.models.base import SequentialModelBase, EmbedContext, unique_rows_sumsq  # noqa: F401
from clsr_tpu.models.registry import get_model_class, MODEL_REGISTRY  # noqa: F401
