"""Gradient utilities (torch-``nn.utils``-shaped extension).

The reference framework has no gradient clipping (SURVEY.md §2.3: its
optimization layer is the four optimizers + schedulers only); finetuning
recipes expect ``clip_grad_norm_``, so this provides the
``torch.nn.utils`` contract on this framework's tensors.  Pure ``jnp``
ops over the accumulated ``.grad`` arrays — works eagerly and traces
into ONE fused XLA program inside ``pdn.jit`` train steps (call it
between ``backward()`` and ``optimizer.step()``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["clip_grad_norm_", "clip_grad_value_"]


def _with_grads(parameters):
    if hasattr(parameters, "_grad"):  # a bare Tensor
        parameters = [parameters]
    return [p for p in parameters if p._grad is not None]


def clip_grad_norm_(parameters, max_norm: float, norm_type: float = 2.0):
    """Scale all gradients so their GLOBAL norm is at most ``max_norm``.

    Mirrors ``torch.nn.utils.clip_grad_norm_`` (same 1e-6 denominator
    guard, ``norm_type=inf`` supported); parameters without gradients are
    skipped.  Returns the pre-clip total norm as a jax scalar
    (``float()`` it eagerly; inside ``pdn.jit`` it is a traced value).
    """
    params = _with_grads(parameters)
    if not params:
        return jnp.float32(0.0)
    max_norm = float(max_norm)
    norm_type = float(norm_type)
    grads = [p._grad for p in params]
    if math.isinf(norm_type):
        total = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in grads]))
    else:
        total = sum(jnp.sum(jnp.abs(g) ** norm_type) for g in grads) \
            ** (1.0 / norm_type)
    scale = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    for p in params:
        p._grad = (p._grad * scale).astype(p._grad.dtype)
    return total


def clip_grad_value_(parameters, clip_value: float):
    """Clamp every gradient element to ``[-clip_value, clip_value]``
    (``torch.nn.utils.clip_grad_value_`` contract)."""
    clip_value = float(clip_value)
    for p in _with_grads(parameters):
        p._grad = jnp.clip(p._grad, -clip_value, clip_value)
