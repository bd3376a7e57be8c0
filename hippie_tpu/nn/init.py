"""Torch-default parameter initializers.

For distributional parity with the reference's training runs we reproduce
torch's default inits (nn.Conv1d / nn.Linear reset_parameters:
kaiming_uniform_(a=sqrt(5)) for weights => U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)); nn.Embedding: N(0, 1)).

All initializers consume an explicit jax PRNG key.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv1d_params(key, k: int, c_in: int, c_out: int, *, bias: bool = True, dtype=jnp.float32):
    """Kernel [K, C_in, C_out] + optional bias [C_out] with torch Conv1d init.

    fan_in = C_in * K; kaiming_uniform(a=sqrt(5)) reduces to bound 1/sqrt(fan_in).
    """
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    params = {"weight": _uniform(wkey, (k, c_in, c_out), bound, dtype)}
    if bias:
        params["bias"] = _uniform(bkey, (c_out,), bound, dtype)
    return params


def dense_params(key, d_in: int, d_out: int, *, bias: bool = True, dtype=jnp.float32):
    """Kernel [in, out] + optional bias [out] with torch Linear init."""
    bound = 1.0 / math.sqrt(d_in)
    wkey, bkey = jax.random.split(key)
    params = {"weight": _uniform(wkey, (d_in, d_out), bound, dtype)}
    if bias:
        params["bias"] = _uniform(bkey, (d_out,), bound, dtype)
    return params


def embedding_params(key, num_embeddings: int, dim: int, *, dtype=jnp.float32):
    """Table [num_embeddings, dim], N(0,1) like torch nn.Embedding."""
    return {"weight": jax.random.normal(key, (num_embeddings, dim), dtype)}
