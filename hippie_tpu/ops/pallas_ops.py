"""Hand-fused Pallas TPU kernels for the cVAE hot path.

``fused_vae_sums`` computes the reconstruction-error and KL partial sums of
the VAE loss (model.py:103-109) in ONE VMEM pass over the batch — elementwise
squared error, the KL transcendental, mask application and both reductions —
with a custom VJP whose backward pass is a single fused kernel producing all
four input gradients. The public ``vae_loss_pallas`` wrapper matches
hippie_tpu.ops.losses.vae_loss numerics exactly (tested in
tests/test_pallas.py against the XLA path and the torch goldens).

On non-TPU backends the kernels run in Pallas interpret mode, so the same
code path is testable on CPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward: masked sums of squared error and KL
# ---------------------------------------------------------------------------


def _fwd_kernel(data_ref, dec_ref, mu_ref, logvar_ref, mask_ref, mse_ref, kl_ref):
    m = mask_ref[:]  # [B, 1]
    # Guard padded rows BEFORE exp/square: their activations are unconstrained
    # (degenerate 1-real-sample BN stats blow them up to ~1e7+) and exp can
    # overflow, after which the mask-multiply computes inf*0 = NaN (see
    # losses._guard_rows). where() on the inputs keeps the sums finite.
    diff = jnp.where(m > 0, dec_ref[:] - data_ref[:], 0.0)
    mse_ref[0, 0] = jnp.sum(diff * diff * m)
    mu = jnp.where(m > 0, mu_ref[:], 0.0)
    lv = jnp.where(m > 0, logvar_ref[:], 0.0)
    kl = -0.5 * (1.0 + lv - mu * mu - jnp.exp(lv))
    kl_ref[0, 0] = jnp.sum(kl * m)


def _bwd_kernel(data_ref, dec_ref, mu_ref, logvar_ref, mask_ref, g_ref,
                ddata_ref, ddec_ref, dmu_ref, dlogvar_ref):
    g_mse = g_ref[0, 0]
    g_kl = g_ref[0, 1]
    m = mask_ref[:]
    diff = jnp.where(m > 0, dec_ref[:] - data_ref[:], 0.0) * m
    ddec_ref[:] = 2.0 * g_mse * diff
    ddata_ref[:] = -2.0 * g_mse * diff
    dmu_ref[:] = g_kl * jnp.where(m > 0, mu_ref[:], 0.0) * m
    lv = jnp.where(m > 0, logvar_ref[:], 0.0)
    dlogvar_ref[:] = g_kl * (-0.5) * (1.0 - jnp.exp(lv)) * m


def _vmem_specs(n):
    if _HAVE_PLTPU:
        return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]
    return [pl.BlockSpec() for _ in range(n)]


@jax.custom_vjp
def fused_vae_sums(data, dec, mu, logvar, mask_col):
    """Returns (sum(mask*(dec-data)^2), sum(mask*kl_elements)). mask_col: [B, 1]."""
    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    if _HAVE_PLTPU:
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    else:  # pragma: no cover
        out_specs = (pl.BlockSpec(), pl.BlockSpec())
    mse, kl = pl.pallas_call(
        _fwd_kernel,
        out_shape=out_shape,
        in_specs=_vmem_specs(5),
        out_specs=out_specs,
        interpret=_interpret(),
    )(data, dec, mu, logvar, mask_col)
    return mse[0, 0], kl[0, 0]


def _fused_fwd(data, dec, mu, logvar, mask_col):
    out = fused_vae_sums(data, dec, mu, logvar, mask_col)
    return out, (data, dec, mu, logvar, mask_col)


def _fused_bwd(res, g):
    data, dec, mu, logvar, mask_col = res
    gvec = jnp.asarray([[g[0], g[1]]], jnp.float32)  # [1, 2] in SMEM
    if _HAVE_PLTPU:
        g_spec = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:  # pragma: no cover
        g_spec = [pl.BlockSpec()]
    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(dec.shape, dec.dtype),
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct(logvar.shape, logvar.dtype),
        ),
        in_specs=_vmem_specs(5) + g_spec,
        out_specs=tuple(_vmem_specs(4)),
        interpret=_interpret(),
    )(data, dec, mu, logvar, mask_col, gvec)
    ddata, ddec, dmu, dlogvar = outs
    return ddata, ddec, dmu, dlogvar, None


fused_vae_sums.defvjp(_fused_fwd, _fused_bwd)


def _sse_kernel(data_ref, dec_ref, mask_ref, out_ref):
    m = mask_ref[:]
    diff = jnp.where(m > 0, dec_ref[:] - data_ref[:], 0.0)
    out_ref[0, 0] = jnp.sum(diff * diff * m)


@jax.custom_vjp
def fused_masked_sse(data, dec, mask_col):
    """sum(mask * (dec-data)^2) in one VMEM pass (for the 2nd modality)."""
    if _HAVE_PLTPU:
        out_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:  # pragma: no cover
        out_spec = pl.BlockSpec()
    out = pl.pallas_call(
        _sse_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=_vmem_specs(3),
        out_specs=out_spec,
        interpret=_interpret(),
    )(data, dec, mask_col)
    return out[0, 0]


def _sse_fwd(data, dec, mask_col):
    return fused_masked_sse(data, dec, mask_col), (data, dec, mask_col)


def _sse_bwd(res, g):
    data, dec, mask_col = res
    # Same inf-padded-row guard as the forward kernel: (inf - data) * 0 = NaN
    diff = jnp.where(mask_col > 0, dec - data, 0.0) * mask_col
    return -2.0 * g * diff, 2.0 * g * diff, None


fused_masked_sse.defvjp(_sse_fwd, _sse_bwd)


def multimodal_vae_loss_pallas(
    data1, data2, dec1, dec2, mu, logvar,
    *,
    beta: float = 1.0,
    mod1_weight: float = 1.0,
    mod2_weight: float = 1.0,
    mask: Optional[jax.Array] = None,
):
    """Drop-in for losses.multimodal_vae_loss on the fused kernels."""
    B = data1.shape[0]
    if mask is None:
        mask_col = jnp.ones((B, 1), data1.dtype)
        n = jnp.asarray(float(B), data1.dtype)
    else:
        mask_col = mask.astype(data1.dtype).reshape(B, 1)
        n = jnp.sum(mask_col)
    mse1_sum, kl_sum = fused_vae_sums(data1, dec1, mu, logvar, mask_col)
    mse2_sum = fused_masked_sse(data2, dec2, mask_col)
    mse1 = mse1_sum / (n * data1.shape[1])
    mse2 = mse2_sum / (n * data2.shape[1])
    kl = kl_sum / n
    total = mod1_weight * mse1 + mod2_weight * mse2 + beta * kl
    return total, (mse1, mse2, kl)


def vae_loss_pallas(
    data: jax.Array,
    dec: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    beta: float = 1.0,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Drop-in replacement for losses.vae_loss using the fused Pallas kernel."""
    B = data.shape[0]
    if mask is None:
        mask_col = jnp.ones((B, 1), data.dtype)
        n = jnp.asarray(float(B), data.dtype)
    else:
        mask_col = mask.astype(data.dtype).reshape(B, 1)
        n = jnp.sum(mask_col)
    mse_sum, kl_sum = fused_vae_sums(data, dec, mu, logvar, mask_col)
    mse = mse_sum / (n * data.shape[1])
    kl = kl_sum / n
    return mse + beta * kl, (mse, kl)
