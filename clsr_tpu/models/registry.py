"""Model factory, mirroring the driver's model dispatch
(examples/00_quick_start/sequential.py:71-304).

Names accept both the reference's flag spellings (CLSR, SLIREC, GRU4REC,
CASER, A2SVD, DIN, DIEN, NCF, NEXTITNET, LGN) and lowercase."""

from __future__ import annotations

from typing import Dict, Type

from clsr_tpu.models.asvd import A2SVDModel
from clsr_tpu.models.base import SequentialModelBase
from clsr_tpu.models.caser import CaserModel
from clsr_tpu.models.clsr import CLSRModel
from clsr_tpu.models.dien import DIENModel
from clsr_tpu.models.din import DINModel
from clsr_tpu.models.gru4rec import GRU4RecModel
from clsr_tpu.models.lgn import LGNModel
from clsr_tpu.models.ncf import NCFModel
from clsr_tpu.models.nextitnet import NextItNetModel
from clsr_tpu.models.sli_rec import SLIRecModel


MODEL_REGISTRY: Dict[str, Type[SequentialModelBase]] = {
    "clsr": CLSRModel,
    "sli_rec": SLIRecModel,
    "slirec": SLIRecModel,
    "gru4rec": GRU4RecModel,
    "caser": CaserModel,
    "a2svd": A2SVDModel,
    "asvd": A2SVDModel,
    "din": DINModel,
    "dien": DIENModel,
    "ncf": NCFModel,
    "nextitnet": NextItNetModel,
    "lgn": LGNModel,
}


def register_model(name: str, cls) -> None:
    MODEL_REGISTRY[name.lower()] = cls


def get_model_class(name: str):
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model {name}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key]
