from clsr_tpu.data.vocab import Vocab, load_vocab  # noqa: F401
from clsr_tpu.data.batch import Batch  # noqa: F401
from clsr_tpu.data.parser import ParsedDataset, parse_file  # noqa: F401
from clsr_tpu.data.loader import SequenceLoader  # noqa: F401
