"""Train state: params + optimizer state + BatchNorm running statistics."""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
from flax.training import train_state

from clsr_tpu.config import Config
from clsr_tpu.data.batch import Batch
from clsr_tpu.training.optimizer import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, cfg: Config, sample_batch: Batch,
                       rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize parameters (like the reference's graph build + init_op,
    base_model.py:52-71) and the optimizer."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_batch, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", flax.core.freeze({}))
    if cfg.optimizer == "lazyadam":
        # sparse row-wise Adam on embedding tables; the train step applies
        # updates itself (training/lazy_adam.py), apply_gradients is unused
        from clsr_tpu.training.lazy_adam import make_lazy_optimizer
        init_fn, _ = make_lazy_optimizer(cfg)
        return TrainState(
            step=jnp.zeros((), jnp.int32), apply_fn=model.apply,
            params=params, tx=None, opt_state=init_fn(params),
            batch_stats=stats)
    return TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=stats,
        tx=build_optimizer(cfg))
