from clsr_tpu.utils.summaries import SummaryWriter  # noqa: F401
from clsr_tpu.utils.timer import Timer  # noqa: F401
