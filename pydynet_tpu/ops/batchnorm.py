"""Fused BatchNorm (training mode) as a single Pallas TPU kernel.

The unfused train-mode BatchNorm is ~6 elementwise/reduce kernels (mean,
center, square, mean, rsqrt, scale-shift).  This kernel does the two
reduction passes and the normalization in ONE VMEM-resident pass and also
emits the batch mean/var needed for the running-statistics update, so the
module's whole train-mode forward is one launch.

Backward is a custom VJP with the standard analytic BatchNorm gradient in
XLA (fuses into 3 kernels).  Shapes that don't fit VMEM or don't tile fall
back to the jnp composite.

Mirrors the reference's train-mode BatchNorm1d semantics (reference
pydynet/nn/modules/norm.py:9-80: biased batch variance normalizes and
feeds the running-stat update; running stats are non-differentiable
buffers), consumed by nn/modules/norm.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_kernel(x_ref, gamma_ref, beta_ref, out_ref, mean_ref, var_ref, *,
               eps: float):
    x = x_ref[:].astype(jnp.float32)
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    centered = x - mean
    var = jnp.sum(centered * centered, axis=0, keepdims=True) / n
    rstd = jax.lax.rsqrt(var + eps)
    out = centered * rstd * gamma_ref[:].astype(jnp.float32) \
        + beta_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)
    mean_ref[:] = mean.astype(mean_ref.dtype)
    var_ref[:] = var.astype(var_ref.dtype)


def _bn_composite(x, gamma, beta, eps):
    # stats in at least f32 (bf16 inputs), never BELOW input precision
    # (f64 grad-check parity); out keeps the usual promotion
    acc = jnp.promote_types(x.dtype, jnp.float32)
    xa = x.astype(acc)
    mean = jnp.mean(xa, axis=0, keepdims=True)
    centered = xa - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    out = centered / jnp.sqrt(var + eps) * gamma.astype(acc) \
        + beta.astype(acc)
    return out.astype(jnp.result_type(x, gamma)), mean, var


def _fits_vmem(x) -> bool:
    # f32/bf16 only: Mosaic has no f64 (the package enables x64 for NumPy
    # dtype parity, so f64 activations are reachable) — everything else
    # takes the composite
    return (x.ndim == 2 and x.dtype in (jnp.float32, jnp.bfloat16)
            and x.size * x.dtype.itemsize <= 4 * 1024 * 1024
            and x.shape[0] >= 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x, gamma, beta, eps=1e-6, interpret=False):
    """(N, C) train-mode BatchNorm -> (out, batch_mean, batch_var).

    gamma/beta: (1, C).  Fused Pallas kernel when the batch fits VMEM.
    """
    if not _fits_vmem(x):
        return _bn_composite(x, gamma, beta, eps)
    N, C = x.shape
    out, mean, var = pl.pallas_call(
        functools.partial(_bn_kernel, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((N, C), x.dtype),
            # mean/var stay f32 (they are (1, C)-tiny): the backward
            # recomputes rstd/xhat from them and the running-stat update
            # consumes them — bf16-rounding either costs ~0.4% rel error
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(x, gamma, beta)
    return out, mean, var


def _bn_fwd(x, gamma, beta, eps, interpret):
    out, mean, var = batch_norm_train(x, gamma, beta, eps, interpret)
    return (out, mean, var), (x, gamma, mean, var)


def _bn_bwd(eps, interpret, res, cts):
    x, gamma, mean, var = res
    # at least f32, never below input precision (f64 grad-check parity)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    dout = cts[0].astype(acc)  # cotangents of mean/var: see below
    n = x.shape[0]
    rstd = jax.lax.rsqrt(var.astype(acc) + eps)
    xhat = (x.astype(acc) - mean.astype(acc)) * rstd

    dbeta = jnp.sum(dout, axis=0, keepdims=True)
    dgamma = jnp.sum(dout * xhat, axis=0, keepdims=True)
    g = dout * gamma.astype(acc)
    dx = rstd * (g - jnp.mean(g, axis=0, keepdims=True)
                 - xhat * jnp.mean(g * xhat, axis=0, keepdims=True))
    # mean/var outputs feed only the (stop-gradient) running-stat update;
    # their cotangents are dropped by design (reference semantics: running
    # stats are buffers, not differentiable outputs)
    return (dx.astype(x.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(gamma.dtype))


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
