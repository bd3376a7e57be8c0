"""Functional NN primitives with PyTorch-matching numerics, TPU-friendly layouts.

Activations are channels-last ``[B, L, C]`` (length on the sublane axis,
channels on the 128-wide lane axis — the natural TPU layout), whereas the torch
reference uses ``[B, C, L]``. Conv kernels are stored ``[K, C_in, C_out]``
('HIO'); the checkpoint shim transposes to/from torch's ``[C_out, C_in, K]``.

BatchNorm follows torch semantics exactly (reference uses nn.BatchNorm1d,
hippie/backbones.py:25,27 etc.): normalization uses the *biased* batch variance
in training, while the running-variance EMA uses the *unbiased* estimate;
momentum 0.1; eps 1e-5. An optional per-sample ``mask`` lets a padded tail
batch participate in a statically-shaped scan without polluting statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Elementwise
# ---------------------------------------------------------------------------


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    """Matches torch.nn.functional.leaky_relu (default slope 0.01).

    The reference uses the default slope in the ResNet backbones
    (backbones.py:37,40,66,69,95) and slope 0.2 in the cVAE fc stacks
    (model.py:24,27,37,40).
    """
    return jnp.where(x >= 0, x, x * negative_slope)


# ---------------------------------------------------------------------------
# Conv / Dense / Embedding
# ---------------------------------------------------------------------------


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """1-D convolution, channels-last.

    x: [B, L, C_in]; weight: [K, C_in, C_out]; returns [B, L_out, C_out] with
    L_out = floor((L + 2*padding - K)/stride) + 1 — identical to torch Conv1d.
    """
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),  # no-op in fp32; enables the bf16 fast path
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def dense(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """Affine map. kernel: [in, out] (transposed vs torch Linear's [out, in])."""
    out = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias
    return out


def embedding(indices: jax.Array, table: jax.Array) -> jax.Array:
    """Embedding lookup; table: [num_embeddings, dim] (same layout as torch)."""
    return jnp.take(table, indices, axis=0)


# ---------------------------------------------------------------------------
# BatchNorm (torch semantics, mask-aware)
# ---------------------------------------------------------------------------


def batch_norm_init(num_features: int, dtype=jnp.float32):
    """Returns (params, state) dicts mirroring torch BatchNorm1d buffers."""
    params = {
        "weight": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), dtype),
        "running_var": jnp.ones((num_features,), dtype),
        "num_batches_tracked": jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
    }
    return params, state


def batch_norm(
    x: jax.Array,
    params: dict,
    state: dict,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    mask: Optional[jax.Array] = None,
):
    """BatchNorm1d over [B, C] or [B, L, C] inputs (stats over all non-C axes).

    Returns (y, new_state). In training mode the normalization uses the biased
    batch variance while the running-var EMA uses the unbiased estimate,
    matching torch exactly. ``mask`` is an optional [B] float/bool vector: rows
    with mask 0 are excluded from batch statistics (used for statically-shaped
    padded tail batches; reference semantics are unpadded per-batch stats).
    """
    if x.ndim == 2:
        reduce_axes = (0,)
        per_sample_elems = 1
    elif x.ndim == 3:
        reduce_axes = (0, 1)
        per_sample_elems = x.shape[1]
    else:  # pragma: no cover - defensive
        raise ValueError(f"batch_norm expects 2D/3D input, got {x.shape}")

    if x.dtype != jnp.float32:
        # bf16 fast path (backbones backend="bf16"): the activation arrives in
        # a reduced dtype but statistics/EMA math must stay fp32 — a bf16
        # reduction over B*L elements loses ~2 decimal digits. The normalized
        # output is cast back so the surrounding block chain stays bf16; the
        # fp32 path below is untouched (bit-identical to the torch goldens).
        y, new_state = batch_norm(
            x.astype(jnp.float32), params, state,
            training=training, momentum=momentum, eps=eps, mask=mask,
        )
        return y.astype(x.dtype), new_state

    if not training:
        inv = lax.rsqrt(state["running_var"] + eps)
        y = (x - state["running_mean"]) * inv * params["weight"] + params["bias"]
        return y, state

    if mask is None:
        n = jnp.asarray(x.shape[0] * per_sample_elems, x.dtype)
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)
    else:
        m = mask.astype(x.dtype)
        mshape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mb = m.reshape(mshape)
        n = jnp.sum(m) * per_sample_elems
        mean = jnp.sum(x * mb, axis=reduce_axes) / n
        var = jnp.sum(jnp.square(x - mean) * mb, axis=reduce_axes) / n

    inv = lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["weight"] + params["bias"]

    unbiased_var = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_state = {
        "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
        "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased_var,
        "num_batches_tracked": state["num_batches_tracked"] + 1,
    }
    return y, new_state


# ---------------------------------------------------------------------------
# Up/down-sampling helpers used by the decoder
# ---------------------------------------------------------------------------


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """torch F.interpolate(mode='nearest', scale_factor=scale) on [B, L, C].

    Nearest with an integer scale picks src = floor(dst/scale), i.e. each input
    element repeats `scale` times (reference: backbones.py:14,131).
    """
    return jnp.repeat(x, scale, axis=1)


def adaptive_avg_pool_to_1(x: jax.Array) -> jax.Array:
    """torch F.adaptive_avg_pool1d(x, 1) on [B, L, C] -> [B, C]."""
    return jnp.mean(x, axis=1)
