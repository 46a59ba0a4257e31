"""Model factory, mirroring the driver's model dispatch
(examples/00_quick_start/sequential.py:71-304)."""

from __future__ import annotations

from typing import Dict, Type

from clsr_tpu.models.base import SequentialModelBase
from clsr_tpu.models.clsr import CLSRModel
from clsr_tpu.models.gru4rec import GRU4RecModel


MODEL_REGISTRY: Dict[str, Type[SequentialModelBase]] = {
    "clsr": CLSRModel,
    "gru4rec": GRU4RecModel,
}


def register_model(name: str, cls) -> None:
    MODEL_REGISTRY[name.lower()] = cls


def get_model_class(name: str):
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model {name}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key]
