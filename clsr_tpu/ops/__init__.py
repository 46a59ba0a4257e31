from clsr_tpu.ops.initializers import get_initializer, tf1_glorot_uniform  # noqa: F401
from clsr_tpu.ops.rnn import GRU, LSTM, Time4LSTM, Time4ALSTM, VecAttGRU  # noqa: F401
from clsr_tpu.ops.attention import TargetAttention, SoftAttention  # noqa: F401
from clsr_tpu.ops.mlp import FcnNet, Dice  # noqa: F401
