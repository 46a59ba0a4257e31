"""Parameter initializers matching the reference's TF1 choices.

Reference `_get_initializer` (base_model.py:161-189) maps init_method to a
TF initializer used for embeddings/MLP/attention params; RNN cell kernels
fall back to TF1's scope default (glorot uniform), GRU gate biases to ones,
other biases to zeros (rnn_cell_implement.py `_Linear`, TF1 GRUCell).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn
from jax import random


def tf1_glorot_uniform(key, shape, dtype=jnp.float32):
    """Glorot uniform that also accepts 1-D shapes, like tf.get_variable's
    default (fan_in = fan_out = shape[0] for rank-1)."""
    if len(shape) == 1:
        fan_in = fan_out = shape[0]
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        return random.uniform(key, shape, dtype, -limit, limit)
    return jnn.initializers.glorot_uniform()(key, shape, dtype)


def get_initializer(init_method: str, init_value: float):
    """Map config init_method to a jax initializer (base_model.py:161-189)."""
    if init_method == "tnormal":
        return jnn.initializers.truncated_normal(stddev=init_value)
    if init_method == "uniform":
        def _sym_uniform(key, shape, dtype=jnp.float32):
            return random.uniform(key, shape, dtype, -init_value, init_value)
        return _sym_uniform
    if init_method == "normal":
        return jnn.initializers.normal(stddev=init_value)
    if init_method == "xavier_normal":
        return jnn.initializers.glorot_normal()
    if init_method == "xavier_uniform":
        return jnn.initializers.glorot_uniform()
    if init_method == "he_normal":
        return jnn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    if init_method == "he_uniform":
        return jnn.initializers.variance_scaling(2.0, "fan_in", "uniform")
    return jnn.initializers.truncated_normal(stddev=init_value)
